from magcache_tpu.schedulers.flow_match import FlowMatchSchedule  # noqa: F401
from magcache_tpu.schedulers.rflow import RFlowSchedule  # noqa: F401
from magcache_tpu.schedulers.unipc import UniPCSchedule  # noqa: F401
