from gsworld_tpu.core import maths  # noqa: F401
