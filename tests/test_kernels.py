"""Pallas kernels vs their lax reference implementations (interpret mode on
CPU; the same kernels compile natively on TPU)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audio_diffusion_tpu.ops.kernels import (
    fused_groupnorm_silu,
    groupnorm_silu_reference,
)


def test_groupnorm_silu_reference_matches_flax():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 32)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    ours = groupnorm_silu_reference(x, scale, bias, num_groups=8)
    gn = nn.GroupNorm(num_groups=8)
    flax_out = gn.apply(
        {"params": {"scale": scale, "bias": bias}}, x)
    flax_out = flax_out * jax.nn.sigmoid(flax_out)
    np.testing.assert_allclose(ours, flax_out, atol=1e-5, rtol=1e-5)


def test_pallas_groupnorm_silu_matches_reference():
    rng = np.random.default_rng(1)
    for shape, groups in [((2, 64, 32), 8), ((1, 128, 16), 4),
                          ((3, 32, 128), 8)]:
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        scale = jnp.asarray(rng.standard_normal(shape[-1]).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(shape[-1]).astype(np.float32))
        ref = groupnorm_silu_reference(x, scale, bias, num_groups=groups)
        out = fused_groupnorm_silu(x, scale, bias, num_groups=groups,
                                   interpret=True)
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)
