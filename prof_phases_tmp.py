"""Phase-level timing of the bench config on the real TPU."""
import os, time, functools
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gsworld_tpu.rollout.random_actions import build

B = int(os.environ.get("B", "4"))
env, wrapper = build("AlignFr3Env-v1", num_envs=B, cfg_name="fr3_align",
                     sim_freq=120, control_freq=40, width=640, height=480,
                     max_per_tile=1024, tile_chunk=16,
                     max_tiles_per_gaussian=16, active_budget_frac=1.0,
                     synthetic_scale=1.0)

state_obs = wrapper.reset(seed=0)
state = wrapper.env.state
action = jnp.zeros((B, env.action_dim), jnp.float32)

def timeit(name, fn, *args, n=20, perturb=None):
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for i in range(n):
        if perturb is not None:
            args = perturb(args, i)
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts = np.asarray(ts) * 1e3
    print(f"{name:34s} p50 {np.percentile(ts,50):7.2f} ms  min {ts.min():7.2f} ms")
    return out

st = state

# 1. physics control step only
def phys(state, action):
    s2, *_ = env._step_fn(state, action)
    return s2.world.qpos, s2.world.a_pos

timeit("physics step (no render)", phys, st, action,
       perturb=lambda a, i: (a[0], a[1] + 1e-6 * i))

# 2. FK + repose
from gsworld_tpu.physics.kinematics import forward_kinematics
from gsworld_tpu.gs.transform import repose_scene

def repose(state):
    def one(world):
        model = env.agent.model
        lp, lq = forward_kinematics(model, world.qpos, world.root_pos,
                                    world.root_quat)
        slots = wrapper._slots_single(lp, lq, world.a_pos, world.a_quat,
                                      world.a_scale)
        return repose_scene(wrapper.scene, slots)
    return jax.vmap(one)(state.world)

posed = timeit("FK + repose (B envs)", repose, st,
               perturb=None)

# 3. project (per env per cam)
import dataclasses
from gsworld_tpu.render.project import project_gaussians
from gsworld_tpu.render.camera import cam_maniskill2gs
cams = env.cameras
cfg = dataclasses.replace(wrapper.raster_config, width=cams[0].width,
                          height=cams[0].height)
ext = env.camera_extrinsics_cv(st, cams)

def project_all(posed, ext):
    def one(p_env, e_env):
        outs = []
        for ci, cam in enumerate(cams):
            gs_cam = cam_maniskill2gs(e_env[ci], jnp.asarray(cam.intrinsic),
                                      cam.width, cam.height,
                                      jnp.asarray(wrapper.rigid_sim2real),
                                      jnp.float32(wrapper.scale_sim2real))
            outs.append(project_gaussians(p_env, gs_cam, cfg,
                                          wrapper.scene.sh0,
                                          wrapper.scene.shN))
        return jax.tree.map(lambda *x: jnp.stack(x), *outs)
    return jax.vmap(one)(posed, ext)

proj = timeit("project (B envs x 2 cams)", project_all, posed, ext)
projf = jax.tree.map(lambda x: x.reshape((B * len(cams),) + x.shape[2:]), proj)

# 4. binning
from gsworld_tpu.render.binning import bin_entries

def bin_all(projf):
    return jax.vmap(lambda p: bin_entries(p, cfg))(projf)

bins = timeit("binning (B*2 frames)", bin_all, projf)

# 5. compositor
from gsworld_tpu.render.rasterize_pallas import composite_tiles_pallas

def comp(projf, bins):
    return composite_tiles_pallas(projf, bins, cfg)[0]

timeit("pallas compositor (B*2 frames)", comp, projf, bins)

def comp_seg(projf, bins):
    return composite_tiles_pallas(projf, bins, cfg,
                                  semantics=wrapper.scene.semantics)[0]

timeit("compositor + seg", comp_seg, projf, bins)

# 6. full fused step (batch_frames on and off)
def full(state, action):
    s2, obs, *_ = wrapper._step_and_render(state, action)
    return obs["sensor_data"][cams[0].name]["rgb"]

timeit("FULL step+render (lax.map path)", full, st, action,
       perturb=lambda a, i: (a[0], a[1] + 1e-6 * i))

wrapper.batch_frames = True
wrapper._jit_step = jax.jit(wrapper._step_and_render)
timeit("FULL step+render (batch_frames)", full, st, action,
       perturb=lambda a, i: (a[0], a[1] + 1e-6 * i))

print("scene N gaussians:", wrapper.scene.means.shape[0])
print("E entries:", bins.gaussian.shape, "tiles:", cfg.num_tiles)
