import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from gsworld_tpu.rollout.random_actions import build
from gsworld_tpu.physics.kinematics import forward_kinematics
from gsworld_tpu.gs.transform import repose_scene
from gsworld_tpu.render.camera import cam_maniskill2gs
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
cfg = wrapper.raster_config
cams = env.cameras
model = env.agent.model

def per_env(world):
    lp, lq = forward_kinematics(model, world.qpos, world.root_pos,
                                world.root_quat)
    slots = wrapper._slots_single(lp, lq, world.a_pos, world.a_quat)
    return repose_scene(wrapper.scene, slots)

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
        outs.append(jnp.clip(img * 255, 0, 255).astype(jnp.uint8))
    return jnp.stack(outs)

def full(s):
    posed = jax.lax.optimization_barrier(jax.vmap(per_env)(s.world))
    ext = env.camera_extrinsics_cv(s, cams)
    return jax.lax.map(body, (posed, ext))

f = jax.jit(full)
out = f(state); jax.block_until_ready(out)
best = np.inf
for i in range(3):
    s2 = state.replace(world=state.world.replace(
        qpos=state.world.qpos + i * 1e-6))
    jax.block_until_ready(s2.world.qpos)
    t0 = time.perf_counter(); out = f(s2); jax.block_until_ready(out)
    best = min(best, time.perf_counter() - t0)
print(f"replica + real repose B={B}: {best*1e3:.0f} ms = "
      f"{best*1e3/(2*B):.1f} ms/frame", flush=True)
