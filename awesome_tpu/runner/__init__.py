from awesome_tpu.runner.config import Config, AwesomeConfig  # noqa: F401
from awesome_tpu.runner.runner import Runner, AwesomeRunner, seed_all  # noqa: F401
