import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from gsworld_tpu.rollout.random_actions import build
from gsworld_tpu.gs.transform import PosedGaussians
from gsworld_tpu.render.camera import make_camera
from gsworld_tpu.render.project import project_gaussians
from gsworld_tpu.render.binning import bin_gaussians
from gsworld_tpu.render.rasterize_pallas import composite_tiles_pallas

env, wrapper = build("AlignFr3Env-v1", num_envs=1, cfg_name="fr3_align",
                     sim_freq=120, control_freq=40, width=640, height=480,
                     max_per_tile=1024, tile_chunk=16,
                     max_tiles_per_gaussian=16, active_budget_frac=1.0)
sc = wrapper.scene
g = PosedGaussians(means=sc.means, log_scales=sc.log_scales, quats=sc.quats,
                   logit_opacities=sc.logit_opacities)
w2c = np.eye(4, dtype=np.float32)
w2c[:3, :3] = np.array([[0, 1, 0], [0, 0, -1], [-1, 0, 0]], np.float32)
w2c[:3, 3] = [0, 0.3, 2.0]
cam = make_camera(w2c, 0.53, 0.4)
cfg = wrapper.raster_config
R = 10  # in-device repeats: amortizes the ~30 ms tunnel dispatch latency

def scan_time(body, x0):
    f = jax.jit(lambda x: jax.lax.scan(
        lambda c, i: (body(c, i), 0.0), x0, jnp.arange(R, dtype=jnp.float32))[0])
    out = f(x0); jax.block_until_ready(out)
    best = np.inf
    for i in range(3):
        t0 = time.perf_counter(); out = f(out); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / R

# project: perturb means each iter so nothing is CSE'd
t = scan_time(lambda gg, i: gg._replace(
    means=gg.means + 1e-9 * project_gaussians(
        gg, cam, cfg, sc.sh0, sc.shN).mean2d.sum() * i), g)
print(f"project: {t:.1f} ms/it", flush=True)

proj0 = jax.jit(lambda gg: project_gaussians(gg, cam, cfg, sc.sh0, sc.shN))(g)
t = scan_time(lambda p, i: p._replace(
    depth=p.depth + 1e-9 * bin_gaussians(p, cfg).counts.sum() * i), proj0)
print(f"bin: {t:.1f} ms/it", flush=True)

bins0 = jax.jit(lambda p: bin_gaussians(p, cfg))(proj0)
def comp_body(p, i):
    img, _ = composite_tiles_pallas(p, bins0, cfg)
    return p._replace(opacity=p.opacity + 1e-12 * img.sum() * i)
t = scan_time(comp_body, proj0)
print(f"pack+pallas composite: {t:.1f} ms/it", flush=True)

def frame(gg, i):
    p = project_gaussians(gg, cam, cfg, sc.sh0, sc.shN)
    b = bin_gaussians(p, cfg)
    img, _ = composite_tiles_pallas(p, b, cfg)
    return gg._replace(means=gg.means + 1e-12 * img.sum() * i)
t = scan_time(frame, g)
print(f"full frame: {t:.1f} ms/it", flush=True)

def sub(p, i):  # binning sub-pieces
    o = jnp.argsort(p.depth)
    return p._replace(depth=p.depth + 1e-9 * o.sum().astype(jnp.float32) * i)
print(f"  depth argsort: {scan_time(sub, proj0):.1f} ms/it", flush=True)
def sub2(p, i):
    n = p.depth.shape[0]
    tile = jax.random.randint(jax.random.PRNGKey(0), (n * 16,), 0, 1201)
    gidx = jnp.arange(n * 16, dtype=jnp.int32)
    t_s, g_s = jax.lax.sort((tile + (p.depth[0] * 0).astype(jnp.int32), gidx),
                            num_keys=1, is_stable=True)
    return p._replace(depth=p.depth + 1e-9 * g_s.sum().astype(jnp.float32) * i)
print(f"  dup stable sort 3.55M: {scan_time(sub2, proj0):.1f} ms/it", flush=True)
