import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from gsworld_tpu.rollout.random_actions import build
from gsworld_tpu.render.camera import cam_maniskill2gs
from gsworld_tpu.render.project import project_gaussians
from gsworld_tpu.render.binning import bin_gaussians
from gsworld_tpu.render.rasterize_pallas import composite_tiles_pallas
from gsworld_tpu.gs.transform import PosedGaussians
B = 16
env, wrapper = build("AlignFr3Env-v1", num_envs=B, cfg_name="fr3_align",
                     sim_freq=120, control_freq=40, width=640, height=480,
                     max_per_tile=1024, tile_chunk=16,
                     max_tiles_per_gaussian=16, active_budget_frac=1.0)
obs, _ = wrapper.reset(seed=0)
state = env.state
sc = wrapper.scene
cfg = wrapper.raster_config
cams = env.cameras
ext = jax.jit(lambda s: env.camera_extrinsics_cv(s, cams))(state)  # (B,C,4,4)
g = PosedGaussians(means=sc.means, log_scales=sc.log_scales, quats=sc.quats,
                   logit_opacities=sc.logit_opacities)
gb = jax.tree.map(lambda x: jnp.stack([x] * B), g)

def body(args):
    gg, ee = args
    outs = []
    for ci, cam in enumerate(cams):
        gs_cam = cam_maniskill2gs(ee[ci], jnp.asarray(cam.intrinsic),
                                  cam.width, cam.height,
                                  jnp.asarray(wrapper.rigid_sim2real),
                                  jnp.float32(wrapper.scale_sim2real))
        p = project_gaussians(gg, gs_cam, cfg, sc.sh0, sc.shN)
        b = bin_gaussians(p, cfg)
        img, _ = composite_tiles_pallas(p, b, cfg)
        outs.append(img)
    return jnp.stack(outs)

f = jax.jit(lambda gg, ee: jax.lax.map(body, (gg, ee)))
out = f(gb, ext); jax.block_until_ready(out)
best = np.inf
for i in range(3):
    g2 = jax.tree.map(lambda x: x + i * 1e-7, gb); jax.block_until_ready(g2.means)
    t0 = time.perf_counter(); out = f(g2, ext); jax.block_until_ready(out)
    best = min(best, time.perf_counter() - t0)
print(f"replica with REAL cams B={B}: {best*1e3:.0f} ms = "
      f"{best*1e3/(2*B):.1f} ms/frame", flush=True)

# per-camera occupancy stats for camera content insight
for ci, cam in enumerate(cams):
    gs_cam = cam_maniskill2gs(ext[0, ci], jnp.asarray(cam.intrinsic),
                              cam.width, cam.height,
                              jnp.asarray(wrapper.rigid_sim2real),
                              jnp.float32(wrapper.scale_sim2real))
    p = project_gaussians(g, gs_cam, cfg, sc.sh0, sc.shN)
    b = bin_gaussians(p, cfg)
    c = np.asarray(b.counts)
    print(f"cam {cam.name}: counts mean {c.mean():.0f} p95 "
          f"{np.percentile(c,95):.0f} max {c.max()}", flush=True)
