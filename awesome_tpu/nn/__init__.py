from awesome_tpu.nn.module import Module  # noqa: F401
from awesome_tpu.nn import init, linear, icnn, flows, path_connected  # noqa: F401
