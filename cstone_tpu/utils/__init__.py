"""Utilities: checkpointing, timing."""

from .checkpoint import load_checkpoint, save_checkpoint
from .timing import Timer
