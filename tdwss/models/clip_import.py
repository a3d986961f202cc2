"""Convert an OpenAI CLIP checkpoint's text tower to tdwss .npz params.

The reference wraps the pretrained ``clip`` package model and calls
``encode_text`` with detached outputs (models/Transformer.py:123-140).
This image has no egress, so weights arrive as a local file: either a
torch ``state_dict`` (the published ViT-B/32 checkpoint format, loaded
with torch-cpu) or an already-converted .npz.

Name mapping (CLIP text tower -> tdwss TextTransformer under 'clip_text'):

    token_embedding.weight                -> token_embedding/embedding
    positional_embedding                  -> positional_embedding
    transformer.resblocks.N.ln_1.{w,b}    -> resblock_N/ln_1/{scale,bias}
    transformer.resblocks.N.attn.in_proj_*-> resblock_N/attn/{query,key,value}
                                             (split thirds; kernels
                                             transposed and reshaped to
                                             flax's (in, heads, head_dim))
    transformer.resblocks.N.attn.out_proj -> resblock_N/attn/out
    transformer.resblocks.N.ln_2.{w,b}    -> resblock_N/ln_2/{scale,bias}
    transformer.resblocks.N.mlp.c_fc      -> resblock_N/c_fc
    transformer.resblocks.N.mlp.c_proj    -> resblock_N/c_proj
    ln_final.{weight,bias}                -> ln_final/{scale,bias}

Usage::

    python -m tdwss.models.clip_import ViT-B-32.pt clip_text.npz
    # then set text_model.clip_weights_path: clip_text.npz
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def convert_text_tower(state: Dict[str, np.ndarray],
                       heads: int) -> Dict[str, np.ndarray]:
    """CLIP text-tower state_dict (numpy values) -> flat tdwss param dict.

    Keys in the returned dict are '/'-joined paths under the CLIPTransformer
    module ('clip_text/...'), ready for np.savez +
    CLIPTransformer.load_pretrained_params.
    """
    def npy(key):
        return np.asarray(state[key], np.float32)

    width = npy("ln_final.weight").shape[0]
    head_dim = width // heads
    out: Dict[str, np.ndarray] = {
        "clip_text/token_embedding/embedding": npy("token_embedding.weight"),
        "clip_text/positional_embedding": npy("positional_embedding"),
        "clip_text/ln_final/scale": npy("ln_final.weight"),
        "clip_text/ln_final/bias": npy("ln_final.bias"),
    }
    n = 0
    while f"transformer.resblocks.{n}.ln_1.weight" in state:
        p = f"transformer.resblocks.{n}"
        o = f"clip_text/resblock_{n}"
        out[f"{o}/ln_1/scale"] = npy(f"{p}.ln_1.weight")
        out[f"{o}/ln_1/bias"] = npy(f"{p}.ln_1.bias")
        out[f"{o}/ln_2/scale"] = npy(f"{p}.ln_2.weight")
        out[f"{o}/ln_2/bias"] = npy(f"{p}.ln_2.bias")
        # attention: torch packs qkv as (3*width, width) acting y = W x
        w_in = npy(f"{p}.attn.in_proj_weight")
        b_in = npy(f"{p}.attn.in_proj_bias")
        for i, name in enumerate(("query", "key", "value")):
            w = w_in[i * width:(i + 1) * width]              # (width, width)
            b = b_in[i * width:(i + 1) * width]
            # flax kernel: (in, heads, head_dim), y = x @ W
            out[f"{o}/attn/{name}/kernel"] = (
                w.T.reshape(width, heads, head_dim))
            out[f"{o}/attn/{name}/bias"] = b.reshape(heads, head_dim)
        w_out = npy(f"{p}.attn.out_proj.weight")             # (width, width)
        out[f"{o}/attn/out/kernel"] = (
            w_out.T.reshape(heads, head_dim, width))
        out[f"{o}/attn/out/bias"] = npy(f"{p}.attn.out_proj.bias")
        # MLP
        out[f"{o}/c_fc/kernel"] = npy(f"{p}.mlp.c_fc.weight").T
        out[f"{o}/c_fc/bias"] = npy(f"{p}.mlp.c_fc.bias")
        out[f"{o}/c_proj/kernel"] = npy(f"{p}.mlp.c_proj.weight").T
        out[f"{o}/c_proj/bias"] = npy(f"{p}.mlp.c_proj.bias")
        n += 1
    return out


def convert_checkpoint(in_path: str, out_path: str) -> int:
    """Load a torch CLIP checkpoint, convert the text tower, save .npz."""
    import torch

    obj = torch.load(in_path, map_location="cpu")
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    state = {k: v.detach().cpu().numpy() for k, v in obj.items()
             if isinstance(v, torch.Tensor)}
    width = state["ln_final.weight"].shape[0]
    heads = max(1, width // 64)
    flat = convert_text_tower(state, heads)
    np.savez(out_path, **flat)
    return len(flat)


if __name__ == "__main__":
    import sys

    n = convert_checkpoint(sys.argv[1], sys.argv[2])
    print(f"wrote {n} arrays to {sys.argv[2]}")
