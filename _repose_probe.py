import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from gsworld_tpu.rollout.random_actions import build
from gsworld_tpu.physics.kinematics import forward_kinematics
from gsworld_tpu.gs.transform import repose_scene
B = 16
env, wrapper = build("AlignFr3Env-v1", num_envs=B, cfg_name="fr3_align",
                     sim_freq=120, control_freq=40, width=640, height=480,
                     max_per_tile=1024, tile_chunk=16,
                     max_tiles_per_gaussian=16, active_budget_frac=1.0)
obs, _ = wrapper.reset(seed=0)
state = env.state
model = env.agent.model

def per_env(world):
    lp, lq = forward_kinematics(model, world.qpos, world.root_pos,
                                world.root_quat)
    slots = wrapper._slots_single(lp, lq, world.a_pos, world.a_quat)
    return repose_scene(wrapper.scene, slots)

f = jax.jit(lambda w: jax.vmap(per_env)(w))
out = f(state.world); jax.block_until_ready(out)
best = np.inf
for i in range(3):
    w2 = state.world.replace(qpos=state.world.qpos + i * 1e-6)
    jax.block_until_ready(w2.qpos)
    t0 = time.perf_counter(); out = f(w2); jax.block_until_ready(out)
    best = min(best, time.perf_counter() - t0)
print(f"vmapped FK+repose B={B}: {best*1e3:.1f} ms", flush=True)
