"""Small model helpers (reference models/misc.py:16-72 parity).

- :class:`Result` — list-or-dict output accumulator used by meta-arch style
  forward functions that return a variable set of tensors.
- :func:`interpolate_pos_encoding` — trilinear resize of a cubic 3D learned
  positional embedding table to a new (H, W, Z) patch grid (the reference
  uses torch bicubic; jax.image supports linear/cubic on 3D volumes).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp


class Result:
    """Accumulates forward outputs as a tuple or a dict (ref :16-54)."""

    def __init__(self, as_dict: bool = False):
        self.outs: Union[Dict[str, Any], List[Any]] = {} if as_dict else []

    @property
    def as_dict(self) -> bool:
        return isinstance(self.outs, dict)

    def append(self, element: Any, name: Optional[str] = None) -> None:
        if self.as_dict:
            if name is None:
                raise ValueError("dict-mode Result.append requires a name")
            self.outs[name] = element
        else:
            self.outs.append(element)

    def update(self, **kwargs: Any) -> None:
        if self.as_dict:
            self.outs.update(**kwargs)
        else:
            for v in kwargs.values():
                self.outs.append(v)

    def as_output(self):
        return self.outs if self.as_dict else tuple(self.outs)

    def as_return(self):
        outs = self.as_output()
        if self.as_dict:
            return outs
        if len(outs) == 1:
            return outs[0]
        return outs


def interpolate_pos_encoding(pos_embed: jnp.ndarray, h: int, w: int,
                             z: int, method: str = "cubic") -> jnp.ndarray:
    """Resize a (1, N, D) cubic-grid positional table to (1, H*W*Z, D).

    N must be a perfect cube (side s); returns pos_embed unchanged when the
    target grid is the same cube (reference misc.py:57-72).
    """
    n, dim = pos_embed.shape[1], pos_embed.shape[2]
    if h * w * z == n and h == w == z:
        return pos_embed
    side = round(n ** (1.0 / 3.0))
    if side**3 != n:
        raise ValueError(f"pos_embed length {n} is not a perfect cube")
    grid = pos_embed.reshape(1, side, side, side, dim)
    resized = jax.image.resize(grid, (1, h, w, z, dim), method=method)
    return resized.reshape(1, h * w * z, dim)
