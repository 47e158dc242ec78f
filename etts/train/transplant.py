"""Pretrained-weight transplant.

Re-implements `TransformerTTS/model/load_pretrained_models.py:5-31` +
`train_autoregressive.py:136-169`: build the donor model from its config dir,
restore its checkpoint, then graft either ALL overlapping parameters or only
the text-encoder subtree into a fresh model's params; the text encoder is then
frozen via the optimizer mask (`make_optimizer(frozen_mask=...)`).
"""
from __future__ import annotations

from typing import Any

import jax

__all__ = ["transplant_params", "load_pretrained_params",
           "text_encoder_freeze_mask"]

TEXT_ENCODER_KEYS = ("TextEncoder", "TextEmbedding")


def transplant_params(target_params: Any, donor_params: Any,
                      only_text_encoder: bool = False) -> Any:
    """Copy donor leaves into target wherever paths AND shapes match.

    Returns (new_params, copied_count, skipped_paths)."""
    copied, skipped = [], []

    def merge(path, tgt, dnr):
        if isinstance(tgt, dict):
            out = {}
            for k, v in tgt.items():
                if isinstance(dnr, dict) and k in dnr:
                    out[k] = merge(path + (k,), v, dnr[k])
                else:
                    skipped.append("/".join(path + (k,)))
                    out[k] = v
            return out
        if only_text_encoder and not any(k in path for k in TEXT_ENCODER_KEYS):
            return tgt
        if hasattr(dnr, "shape") and dnr.shape == tgt.shape:
            copied.append("/".join(path))
            return dnr.astype(tgt.dtype)
        skipped.append("/".join(path))
        return tgt

    new = merge((), target_params, donor_params)
    return new, len(copied), skipped


def load_pretrained_params(pretrained_config_dir, model_kind="autoregressive",
                           checkpoint=None):
    """Build + restore the donor; returns its params
    (load_pretrained_models.py:5-31)."""
    from ..utils.config import ConfigManager
    cm = ConfigManager(pretrained_config_dir, model_kind)
    _, variables, step, _ = cm.load_model(checkpoint, verbose=True)
    return variables["params"], step


def text_encoder_freeze_mask(params) -> Any:
    """Freeze mask (True = frozen) over the text-encoder subtree
    (train_autoregressive.py:136-169 sets trainable=False)."""
    mask = jax.tree.map(lambda _: False, params)
    for name in TEXT_ENCODER_KEYS:
        if name in mask:
            mask[name] = jax.tree.map(lambda _: True, mask[name])
    return mask
