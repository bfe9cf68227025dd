from awesome_tpu.utils.timer import Timer  # noqa: F401
from awesome_tpu.utils.format import strfdelta, snake_case  # noqa: F401
