"""Fetch-timed phase profile of the batched render path on TPU."""
import dataclasses, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gsworld_tpu.rollout.random_actions import build
from gsworld_tpu.physics.kinematics import forward_kinematics
from gsworld_tpu.gs.transform import repose_scene
from gsworld_tpu.render.project import project_gaussians
from gsworld_tpu.render.camera import cam_maniskill2gs
from gsworld_tpu.render.binning import bin_entries
from gsworld_tpu.render.rasterize_pallas import composite_tiles_pallas

B = 4
env, wrapper = build("AlignFr3Env-v1", num_envs=B, cfg_name="fr3_align",
                     sim_freq=120, control_freq=40, width=640, height=480,
                     max_per_tile=1024, tile_chunk=16,
                     max_tiles_per_gaussian=16, active_budget_frac=1.0,
                     synthetic_scale=1.0)
wrapper.reset(seed=0)
state = env.state
action = jnp.zeros((B, env.action_dim))
cams = env.cameras
C = len(cams)
cfg = dataclasses.replace(wrapper.raster_config, width=cams[0].width,
                          height=cams[0].height)


def fetch(x):
    leaves = jax.tree.leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:8]))


def timeit(name, fn, gen, n=6):
    f = jax.jit(fn)
    o = f(*gen(0)); fetch(o)
    ts = []
    for i in range(1, n):
        args = gen(i)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        o = f(*args)
        fetch(o)
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} p50 {np.median(ts)*1e3:8.2f} ms", flush=True)
    return o


# physics
def phys(state, action):
    s2, *_ = env._step_fn(state, action)
    return s2.world.qpos

timeit("physics control step", phys, lambda i: (state, action + i * 1e-6))

# repose
def repose(world):
    def one(w):
        model = env.agent.model
        lp, lq = forward_kinematics(model, w.qpos, w.root_pos, w.root_quat)
        slots = wrapper._slots_single(lp, lq, w.a_pos, w.a_quat, w.a_scale)
        return repose_scene(wrapper.scene, slots)
    return jax.vmap(one)(world)

def gen_world(i):
    w = state.world
    return (w.replace(qpos=w.qpos + i * 1e-6),)

posed = timeit("FK + repose", repose, gen_world)

ext = env.camera_extrinsics_cv(state, cams)

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
    out = jax.vmap(one)(posed, ext)
    return jax.tree.map(lambda x: x.reshape((B * C,) + x.shape[2:]), out)

def gen_pe(i):
    return (jax.tree.map(lambda x: x + i * 1e-6 if x.dtype == jnp.float32
                         else x, posed), ext)

projf = timeit("project (8 frames)", project_all, gen_pe)

def bin_all(projf):
    return jax.vmap(lambda p: bin_entries(p, cfg))(projf)

def gen_proj(i):
    return (projf._replace(depth=projf.depth + i * 1e-6),)

bins = timeit("binning (8 frames)", bin_all, gen_proj)

def comp(projf, bins):
    return composite_tiles_pallas(projf, bins, cfg)[0]

def gen_pb(i):
    return (projf._replace(opacity=jnp.clip(projf.opacity + i * 1e-6, 0, 1)),
            bins)

timeit("pallas compositor (8 frames)", comp, gen_pb)

# project+bin+composite fused
def pbc(posed, ext):
    p = project_all(posed, ext)
    b = jax.vmap(lambda q: bin_entries(q, cfg))(p)
    return composite_tiles_pallas(p, b, cfg)[0]

timeit("project+bin+composite (8 frames)", pbc, gen_pe)

# live entry stats
st = np.asarray(bins.starts)
print("live entries per frame:", st[:, -1], "of E =", cfg.max_entries)
print("overflow:", np.asarray(bins.overflow))
