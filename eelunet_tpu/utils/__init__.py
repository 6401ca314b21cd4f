from eelunet_tpu.utils.profiling import StepTimer, trace_context
from eelunet_tpu.utils.seeding import set_seed

__all__ = ["StepTimer", "trace_context", "set_seed"]
