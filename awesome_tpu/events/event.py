"""Observer-pattern events for host-side orchestration.

Behavior port of `awesome/event/event.py:8-101` (attach/notify/remove,
shared context, cancelable args) and the typed-error hierarchy
(`awesome/error/stop_training.py`). Inside compiled code events don't
exist — those hooks became scan-carry state (plateau LR, watchdog, NaN
guard); this module serves the HOST loop: epoch callbacks, checkpoint
saves, metric logging, plot dumps.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Generic, List, Optional, TypeVar

T = TypeVar("T")


class StopTraining(Exception):
    """Graceful training-stop control flow.

    Spec: `awesome/error/stop_training.py`.
    """


@dataclasses.dataclass
class EventArgs:
    """Base payload; ``cancel`` stops remaining handlers."""

    cancel: bool = False
    context: Dict[str, Any] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class EpochEventArgs(EventArgs):
    epoch: int = 0
    metrics: Dict[str, float] = dataclasses.field(default_factory=dict)
    mode: str = "train"


@dataclasses.dataclass
class SaveEventArgs(EventArgs):
    stage: str = "checkpoint"  # 'pretrain' | 'best' | 'end' | 'checkpoint'
    path: Optional[str] = None


class Event(Generic[T]):
    """attach/notify/remove with mute support."""

    def __init__(self, name: str = ""):
        self.name = name
        self._handlers: List[Callable[[Any, T], None]] = []
        self.muted = False

    def attach(self, handler: Callable[[Any, T], None]) -> Callable:
        self._handlers.append(handler)
        return handler

    def remove(self, handler: Callable) -> None:
        self._handlers.remove(handler)

    def notify(self, sender: Any, args: T) -> None:
        if self.muted:
            return
        for h in list(self._handlers):
            h(sender, args)
            if getattr(args, "cancel", False):
                break

    def __len__(self) -> int:
        return len(self._handlers)
