from gsworld_tpu.envs.registry import make, register_env, registered_envs  # noqa: F401


def _register_all():
    # import task modules for their registration side effects
    from gsworld_tpu.envs.tasks import real_fr3, real_xarm  # noqa: F401
    from gsworld_tpu.envs.tasks.tabletop.franka import (  # noqa: F401
        align,
        pnp_box,
        pour_mustard,
        stack,
    )
    from gsworld_tpu.envs.tasks.tabletop.xarm6 import (  # noqa: F401
        align as xarm_align,
        rotate_banana,
        spoon_on_board,
    )


_register_all()
