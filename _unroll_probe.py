import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from gsworld_tpu.rollout.random_actions import build
from gsworld_tpu.gs.transform import PosedGaussians
from gsworld_tpu.render.camera import make_camera
from gsworld_tpu.render.project import project_gaussians
from gsworld_tpu.render.binning import bin_gaussians
from gsworld_tpu.render.rasterize_pallas import composite_tiles_pallas

B = 16
env, wrapper = build("AlignFr3Env-v1", num_envs=B, cfg_name="fr3_align",
                     sim_freq=120, control_freq=40, width=640, height=480,
                     max_per_tile=1024, tile_chunk=16,
                     max_tiles_per_gaussian=16, active_budget_frac=1.0)
obs, _ = wrapper.reset(seed=0)
state = env.state
sc = wrapper.scene
g = PosedGaussians(means=sc.means, log_scales=sc.log_scales, quats=sc.quats,
                   logit_opacities=sc.logit_opacities)
w2c = np.eye(4, dtype=np.float32)
w2c[:3, :3] = np.array([[0, 1, 0], [0, 0, -1], [-1, 0, 0]], np.float32)
w2c[:3, 3] = [0, 0.3, 2.0]
cam = make_camera(w2c, 0.53, 0.4)
cfg = wrapper.raster_config
gb = jax.tree.map(lambda x: jnp.stack([x + i * 1e-6 for i in range(B)]), g)

def frame(gg):
    p = project_gaussians(gg, cam, cfg, sc.sh0, sc.shN)
    b = bin_gaussians(p, cfg)
    img, _ = composite_tiles_pallas(p, b, cfg)
    return img

def t(f, x0, nf):
    out = f(x0); jax.block_until_ready(out)
    best = np.inf
    for i in range(3):
        x = jax.tree.map(lambda a: (a + i * 1e-7).astype(a.dtype)
                         if jnp.issubdtype(a.dtype, jnp.floating) else a, x0)
        jax.block_until_ready(x)
        t0 = time.perf_counter(); out = f(x); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3, best * 1e3 / nf

fmap = jax.jit(lambda gg: jax.lax.map(frame, gg))
ms, pf = t(fmap, gb, B)
print(f"bare lax.map B={B}, 1 cam: {ms:.0f} ms = {pf:.1f} ms/frame", flush=True)

def two(gg):  # 2 cams per iteration like the wrapper
    return jnp.stack([frame(gg), frame(gg._replace(means=gg.means + 1e-6))])
fmap2 = jax.jit(lambda gg: jax.lax.map(two, gg))
ms, pf = t(fmap2, gb, 2 * B)
print(f"lax.map B={B}, 2 cams/iter: {ms:.0f} ms = {pf:.1f} ms/frame", flush=True)

def two_u8(gg):
    a = jnp.clip(frame(gg) * 255, 0, 255).astype(jnp.uint8)
    b = jnp.clip(frame(gg._replace(means=gg.means + 1e-6)) * 255, 0,
                 255).astype(jnp.uint8)
    return jnp.stack([a, b])
fmap3 = jax.jit(lambda gg: jax.lax.map(two_u8, gg))
ms, pf = t(fmap3, gb, 2 * B)
print(f"  + uint8: {ms:.0f} ms = {pf:.1f} ms/frame", flush=True)

ren = jax.jit(wrapper._render_fn)
ms, pf = t(ren, state, 2 * B)
print(f"wrapper._render_fn: {ms:.0f} ms = {pf:.1f} ms/frame", flush=True)
