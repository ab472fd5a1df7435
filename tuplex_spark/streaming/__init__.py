from .events import (windowed_counts, sessionize, stream_from_directory,  # noqa: F401
                     run_stream_to_memory, stream_dedup,
                     running_user_stats, running_user_stats_tws,
                     stream_correlate)
