from gsworld_tpu.envs.registry import make, register_env, registered_envs  # noqa: F401


def _register_all():
    # import task modules for their registration side effects
    from gsworld_tpu.envs.tasks import real_fr3  # noqa: F401
    from gsworld_tpu.envs.tasks.tabletop.franka import align  # noqa: F401


_register_all()
