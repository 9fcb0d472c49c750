"""Host->device prefetching: overlap nibabel-style IO + geometry with compute.

The reference relies on torch DataLoader workers (data/__init__.py:75-79);
here a background thread pipelines batch construction and device placement
(double buffering) so the jitted step never waits on the host.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_SENTINEL = object()


def prefetch_to_device(iterable: Iterable, place_fn, depth: int = 2) -> Iterator:
    """Yields place_fn(batch) for each batch, produced ahead by a worker.

    place_fn typically is `lambda b: shard_batch(b, mesh)`. Exceptions in the
    worker propagate to the consumer.
    """
    q: queue.Queue = queue.Queue(maxsize=depth)

    def worker():
        try:
            for batch in iterable:
                q.put(place_fn(batch))
        except BaseException as e:  # propagate into the consuming thread
            q.put(("__error__", e))
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        if isinstance(item, tuple) and len(item) == 2 and item[0] == "__error__":
            raise item[1]
        yield item
