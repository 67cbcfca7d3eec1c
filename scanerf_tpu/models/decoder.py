"""ShallowMLP radiance decoder.

Architecture mirrors ``network.py:151-190``:

- Spatial MLP: Linear(32->64) -> GaussianAct(sigma=0.1) -> Linear(64->64).
- On the first 32 hidden channels: sigma head (Linear(32->1)+Softplus),
  diffuse head (Linear(32->3)+Sigmoid), tint head (Linear(32->3)+Sigmoid).
- Directional MLP on the last 32 hidden channels concatenated with the
  degree-3 SH embedding (16) of the normalized view direction:
  Linear(48->64) -> Gauss -> Linear(64->64) -> Gauss -> Linear(64->3),
  then Sigmoid -> specular base color c_s.
- The final specular radiance composited by the field is tint * c_s
  (``hashgrid/__init__.py:569``).

GaussianAct(x) = exp(-x^2 / (2*0.1^2)) = exp(-50 x^2) (``network.py:79-84``).

Implemented as a flat param pytree with pure apply functions; matmuls run
on the MXU in the caller's dtype with fp32 accumulation. The whole decoder
is ~14k params (PARAMSIZE 13994 packed, ``hashgrid/include/decoder.h:48``),
so all weights stay resident in VMEM during fused inference.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from scanerf_tpu.utils.sh import sh_encoding

GAUSS_SIGMA = 0.1


def gaussian_act(x: jax.Array) -> jax.Array:
    return jnp.exp(x * x * (-1.0 / (2.0 * GAUSS_SIGMA**2)))


def _linear_init(key: jax.Array, fan_in: int, fan_out: int) -> dict:
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound),
    }


def _linear(p: dict, x: jax.Array) -> jax.Array:
    return (
        jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32)
        + p["b"]
    )


def init_decoder(key: jax.Array, in_channel: int = 32) -> dict[str, Any]:
    ks = jax.random.split(key, 8)
    return {
        "spatial0": _linear_init(ks[0], in_channel, 64),
        "spatial1": _linear_init(ks[1], 64, 64),
        "sigma": _linear_init(ks[2], 32, 1),
        "diffuse": _linear_init(ks[3], 32, 3),
        "tint": _linear_init(ks[4], 32, 3),
        "dir0": _linear_init(ks[5], 32 + 16, 64),
        "dir1": _linear_init(ks[6], 64, 64),
        "dir2": _linear_init(ks[7], 64, 3),
    }


def spatial_hidden(params: dict, features: jax.Array) -> jax.Array:
    h = gaussian_act(_linear(params["spatial0"], features))
    return _linear(params["spatial1"], h)


def apply_decoder(
    params: dict,
    features: jax.Array,
    viewdirs: jax.Array,
    weight_feature: jax.Array,
) -> dict[str, jax.Array]:
    """Full decoder forward (``network.py:172-190``).

    Args:
        features: [..., 32] hash features (pre-annealing).
        viewdirs: [..., 3] unnormalized view directions.
        weight_feature: [..., 32] or [32] BARF annealing weights applied to
            features before the spatial MLP (``network.py:179``).

    Returns:
        dict with sigma [..., 1], diffuse/tint/specular [..., 3].
    """
    viewdirs = viewdirs / (jnp.linalg.norm(viewdirs, axis=-1, keepdims=True) + 1e-8)
    H = spatial_hidden(params, features * weight_feature)
    h_geo, h_dir = H[..., :32], H[..., 32:]

    sigma = jax.nn.softplus(_linear(params["sigma"], h_geo))
    diffuse = jax.nn.sigmoid(_linear(params["diffuse"], h_geo))
    tint = jax.nn.sigmoid(_linear(params["tint"], h_geo))

    sh = sh_encoding(3, viewdirs)
    d = jnp.concatenate([h_dir, sh], axis=-1)
    d = gaussian_act(_linear(params["dir0"], d))
    d = gaussian_act(_linear(params["dir1"], d))
    specular = jax.nn.sigmoid(_linear(params["dir2"], d))

    return {"sigma": sigma, "diffuse": diffuse, "specular": specular, "tint": tint}


def inference_sigma(params: dict, features: jax.Array) -> jax.Array:
    """Fast sigma-only path (``network.py:168-170``)."""
    h = spatial_hidden(params, features)
    return jax.nn.softplus(_linear(params["sigma"], h[..., :32]))


# ---------------------------------------------------------------------------
# Generic building blocks (network.py extras)
# ---------------------------------------------------------------------------

def positional_encoding(x: jax.Array, L: int) -> jax.Array:
    """[x, sin(2^i x), cos(2^i x)] for i < L (network.py:93-104)."""
    outs = [x]
    for i in range(L):
        outs.append(jnp.sin(2.0**i * x))
        outs.append(jnp.cos(2.0**i * x))
    return jnp.concatenate(outs, axis=-1)


def weighted_positional_encoding(
    x: jax.Array, L: int, global_step: jax.Array, start: float, end: float
) -> jax.Array:
    """BARF coarse-to-fine PE (network.py:106-124): frequency bands fade
    in as alpha = (step-start)/(end-start)*L."""
    emb = positional_encoding(x, L)
    alpha = jnp.clip((global_step - start) / (end - start) * L, 0.0, L)
    k = jnp.arange(L, dtype=x.dtype)
    w = (1.0 - jnp.cos(jnp.clip(alpha - k, 0.0, 1.0) * jnp.pi)) / 2.0
    C = x.shape[-1]
    band_w = jnp.repeat(w, 2 * C)  # sin+cos per band, per channel
    return jnp.concatenate([emb[..., :C], emb[..., C:] * band_w], axis=-1)


def init_general_mlp(
    key: jax.Array,
    num_in: int,
    num_out: int,
    hidden_depth: int = 4,
    hidden_width: int = 64,
) -> list[dict]:
    """GeneralMLP builder (network.py:127-148): depth 1 = single linear;
    otherwise in->w, (depth-2) x w->w, w->out."""
    if hidden_depth == 1:
        return [_linear_init(key, num_in, num_out)]
    ks = jax.random.split(key, hidden_depth)
    layers = [_linear_init(ks[0], num_in, hidden_width)]
    for i in range(hidden_depth - 2):
        layers.append(_linear_init(ks[1 + i], hidden_width, hidden_width))
    layers.append(_linear_init(ks[-1], hidden_width, num_out))
    return layers


def apply_general_mlp(
    layers: list[dict], x: jax.Array, activation=gaussian_act, output_act: bool = False
) -> jax.Array:
    for i, p in enumerate(layers):
        x = _linear(p, x)
        if i < len(layers) - 1 or output_act:
            x = activation(x)
    return x


# ---------------------------------------------------------------------------
# Packed parameter vector (inference export)
# ---------------------------------------------------------------------------
# Layout mirrors hashgrid/include/decoder.h:48-67 + rendering.py:100-113:
# per layer, bias first then the weight matrix flattened as [out, in]
# (torch Linear storage), in the order: spatial0, spatial1, sigma, diffuse,
# tint, dir0, dir1, dir2. Total 13994 floats for in_channel=32.

_PACK_ORDER = ("spatial0", "spatial1", "sigma", "diffuse", "tint", "dir0", "dir1", "dir2")

PARAMSIZE = 13994


def pack_params(params: dict) -> jax.Array:
    chunks = []
    for name in _PACK_ORDER:
        p = params[name]
        chunks.append(p["b"].reshape(-1))
        chunks.append(p["w"].T.reshape(-1))  # [out, in] flat, torch layout
    return jnp.concatenate(chunks)


def unpack_params(vec: jax.Array, in_channel: int = 32) -> dict:
    shapes = {
        "spatial0": (in_channel, 64),
        "spatial1": (64, 64),
        "sigma": (32, 1),
        "diffuse": (32, 3),
        "tint": (32, 3),
        "dir0": (48, 64),
        "dir1": (64, 64),
        "dir2": (64, 3),
    }
    out = {}
    i = 0
    for name in _PACK_ORDER:
        fan_in, fan_out = shapes[name]
        b = vec[i : i + fan_out]
        i += fan_out
        w = vec[i : i + fan_in * fan_out].reshape(fan_out, fan_in).T
        i += fan_in * fan_out
        out[name] = {"w": w, "b": b}
    return out
