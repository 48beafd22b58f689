from .trace import BlockTimer, device_trace, log_event, logger
