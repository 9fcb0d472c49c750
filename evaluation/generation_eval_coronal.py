#!/usr/bin/env python
"""Coronal generation eval: thin wrapper forcing --coronal."""

import sys

from generation_eval_sagittal import main

if __name__ == "__main__":
    main(sys.argv[1:] + ["--coronal"])
