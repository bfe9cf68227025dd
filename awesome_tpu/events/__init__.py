from awesome_tpu.events.event import (  # noqa: F401
    Event,
    EventArgs,
    EpochEventArgs,
    SaveEventArgs,
    StopTraining,
)
from awesome_tpu.events.watchdog import LearningRateStopWatchdog  # noqa: F401
