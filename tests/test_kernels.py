"""Pallas kernels vs their lax reference implementations (interpret mode on
CPU; the same kernels compile natively on TPU)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

def test_fused_resnet_item_matches_unet_items():
    """Fused kernel (interpret mode) == ResnetItem∘ModulationItem with the
    same parameters, on a folded tensor."""
    import flax.linen as nn

    from audio_diffusion_tpu.ops.folding import fold, fold_conv3_kernel
    from audio_diffusion_tpu.ops.kernels.resnet import (
        fused_resnet_item, group_map, resnet_item_reference)
    from audio_diffusion_tpu.ops.unet import ModulationItem, ResnetItem

    rng = np.random.default_rng(0)
    B, L, C, F, G = 2, 256, 8, 16, 8
    W = F * C
    x = jnp.asarray(rng.standard_normal((B, L, C)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((B, 32)).astype(np.float32))

    resnet = ResnetItem(channels=C, fold=F, groups=G)
    modul = ModulationItem(channels=C, fold=F, groups=G)
    xf = fold(x, F)
    p_res = resnet.init(jax.random.key(0), xf)
    p_mod = modul.init(jax.random.key(1), xf, feats)
    expected = modul.apply(p_mod, resnet.apply(p_res, xf), feats)

    # Assemble the kernel inputs from the same params.
    pr = p_res["params"]
    pm = p_mod["params"]
    tile = lambda v: jnp.tile(v, F)[None]  # [1, W]
    k1 = fold_conv3_kernel(pr["conv1_kernel"], F)
    k2 = fold_conv3_kernel(pr["conv2_kernel"], F)
    # Recompute the modulation MLP output directly from its params:
    dense_p = pm["Dense_0"]
    modvec = nn.silu(feats) @ dense_p["kernel"] + dense_p["bias"]
    scale, shift = jnp.split(modvec, 2, axis=-1)  # [B, C]
    mods = jnp.tile(scale, (1, F))
    modb = jnp.tile(shift, (1, F))

    m = jnp.asarray(group_map(F, C, G))
    args = (xf, tile(pr["gn1_scale"]), tile(pr["gn1_bias"]), k1,
            tile(pr["conv1_bias"]), tile(pr["gn2_scale"]),
            tile(pr["gn2_bias"]), k2, tile(pr["conv2_bias"]), m, m.T,
            mods, modb, tile(pm["gn_scale"]), tile(pm["gn_bias"]))

    ref = resnet_item_reference(
        args[0], args[1], args[2], args[3], args[4], args[5], args[6],
        args[7], args[8], args[9], args[11], args[12], args[13], args[14])
    np.testing.assert_allclose(np.asarray(ref), np.asarray(expected),
                               atol=2e-4, rtol=2e-4)

    out = fused_resnet_item(*args, 1e-5, True, True)  # interpret mode
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=2e-4, rtol=2e-4)


def test_fused_resnet_item_grad():
    """Custom VJP (lax recompute) produces finite grads matching the
    reference path."""
    from audio_diffusion_tpu.ops.folding import fold_conv3_kernel
    from audio_diffusion_tpu.ops.kernels.resnet import (
        fused_resnet_item, group_map, resnet_item_reference)

    rng = np.random.default_rng(1)
    B, Lf, C, F, G = 1, 16, 8, 4, 4
    W = F * C
    x = jnp.asarray(rng.standard_normal((B, Lf, W)).astype(np.float32))
    vec = lambda: jnp.asarray(  # noqa: E731
        rng.standard_normal((1, W)).astype(np.float32) * 0.1 + 1.0)
    k = lambda: fold_conv3_kernel(jnp.asarray(  # noqa: E731
        rng.standard_normal((3, C, C)).astype(np.float32) * 0.2), F)
    m = jnp.asarray(group_map(F, C, G))
    mods = jnp.zeros((B, W))
    args = (x, vec(), vec(), k(), vec(), vec(), vec(), k(), vec(), m, m.T,
            mods, mods, vec(), vec())

    def loss_fused(x):
        return jnp.sum(fused_resnet_item(x, *args[1:], 1e-5, True, True)**2)

    def loss_ref(x):
        return jnp.sum(resnet_item_reference(
            x, args[1], args[2], args[3], args[4], args[5], args[6],
            args[7], args[8], args[9], args[11], args[12], args[13],
            args[14])**2)

    g_fused = jax.grad(loss_fused)(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=1e-3, rtol=1e-3)
