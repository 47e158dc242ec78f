"""Tiny bounded LRU mapping for compiled-program caches.

Serving paths cache jitted programs keyed on ``id(model)`` and hold a strong
model reference in the value (so a recycled id() can never alias a stale
compiled program). Unbounded, that means a long-lived serving process which
constructs many model/config variants retains every model's params and
compiled executables forever (ADVICE r3). This LRU keeps the stale-id safety
property while bounding retention to the most recently used variants.
"""
from collections import OrderedDict

__all__ = ["LRU"]


class LRU:
    """Minimal LRU dict: __contains__/__getitem__/__setitem__ only."""

    def __init__(self, maxsize: int = 8):
        self.maxsize = int(maxsize)
        self._d = OrderedDict()

    def __contains__(self, k):
        return k in self._d

    def __getitem__(self, k):
        self._d.move_to_end(k)
        return self._d[k]

    def __setitem__(self, k, v):
        self._d[k] = v
        self._d.move_to_end(k)
        while len(self._d) > self.maxsize:
            self._d.popitem(last=False)

    def __len__(self):
        return len(self._d)
