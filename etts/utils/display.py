"""Console + image display helpers (`TransformerTTS/utils/display.py`,
`WaveRNN/utility/display.py` equivalents)."""
from __future__ import annotations

import sys

import numpy as np

__all__ = ["buffer_image", "tight_grid", "progbar", "stream", "simple_table",
           "ValueWindow"]


def tight_grid(images):
    """Stack a list/array of equal-size 2-D maps into one image grid."""
    images = np.asarray(images)
    if images.ndim == 2:
        return images
    n = images.shape[0]
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    h, w = images.shape[1], images.shape[2]
    grid = np.zeros((rows * h, cols * w), images.dtype)
    for i in range(n):
        r, c = divmod(i, cols)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = images[i]
    return grid


def buffer_image(array, cmap="viridis"):
    """2-D array -> (h, w, 3) uint8 image via matplotlib colormap."""
    import matplotlib.cm as cm
    array = np.asarray(array, np.float32)
    lo, hi = float(array.min()), float(array.max())
    norm = (array - lo) / (hi - lo + 1e-8)
    rgba = getattr(cm, cmap)(norm)
    return (rgba[..., :3] * 255).astype(np.uint8)


def progbar(i, n, size=16):
    done = int(i * size) // max(n, 1)
    return "|" + "█" * done + " " * (size - done) + "|"


def stream(message):
    sys.stdout.write(f"\r{message}")
    sys.stdout.flush()


def simple_table(item_tuples):
    border_pattern = "+---------------------------------------"
    whitespace = "                                            "
    headings, cells = [], []
    for item in item_tuples:
        heading, cell = str(item[0]), str(item[1])
        pad_head = True if len(heading) < len(cell) else False
        pad = abs(len(heading) - len(cell))
        pad = whitespace[:pad]
        pad_left = pad[:len(pad) // 2]
        pad_right = pad[len(pad) // 2:]
        if pad_head:
            heading = pad_left + heading + pad_right
        else:
            cell = pad_left + cell + pad_right
        headings += [heading]
        cells += [cell]
    border, head, body = "", "", ""
    for i in range(len(item_tuples)):
        head += "| " + headings[i] + " "
        body += "| " + cells[i] + " "
        border += border_pattern[:len(headings[i]) + 2]
    border += "+"
    head += "|"
    body += "|"
    print(border, head, border, body, border, sep="\n")


class ValueWindow:
    """Rolling average window (`gst_tacotron/util/__init__.py:1-21`)."""

    def __init__(self, window_size=100):
        self._window_size = window_size
        self._values = []

    def append(self, x):
        self._values = self._values[-(self._window_size - 1):] + [x]

    @property
    def sum(self):
        return sum(self._values)

    @property
    def count(self):
        return len(self._values)

    @property
    def average(self):
        return self.sum / max(1, self.count)

    def reset(self):
        self._values = []
