"""Cross-cutting utilities: profiling, seeding."""

from radnet_tpu.utils.profiling import Timer, profile_trace, stage_timer

__all__ = ["Timer", "profile_trace", "stage_timer"]
