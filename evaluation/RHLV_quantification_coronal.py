#!/usr/bin/env python
"""Coronal RHLV quantification: thin wrapper forcing --coronal."""

import sys

from RHLV_quantification import main

if __name__ == "__main__":
    main(sys.argv[1:] + ["--coronal"])
