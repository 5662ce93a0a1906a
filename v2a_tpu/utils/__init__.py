from v2a_tpu.utils.profiling import (  # noqa: F401
    Timer,
    device_memory_stats,
    param_count,
    print_color,
    report_parameters,
    trace,
)
