"""`ignore_exception` / `time_it` decorators
(`TransformerTTS/utils/decorators.py:5-26` parity): keep training alive through
non-critical logging failures; wall-clock phase timing."""
from __future__ import annotations

import time
import traceback

__all__ = ["ignore_exception", "time_it"]


def ignore_exception(func):
    def wrapper(*args, **kwargs):
        try:
            return func(*args, **kwargs)
        except Exception:  # noqa: BLE001
            print(f"Catched exception in {func.__name__}:")
            traceback.print_exc()
            return None

    return wrapper


def time_it(func):
    def wrapper(*args, **kwargs):
        t0 = time.time()
        result = func(*args, **kwargs)
        return result, time.time() - t0

    return wrapper
