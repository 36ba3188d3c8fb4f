"""Source/sink layer (SURVEY.md §2.1): schema'd batch readers live in
``..catalog``; streaming file/rate sources in ``..streaming``; this package
adds the 100 TB *layout* primitives — date-partitioned and bucketed
writes, whose pruning/co-location the engine's plans then exploit."""

from .layout import (  # noqa: F401
    write_bucketed,
    write_partitioned_by_date,
)
from .streams import (  # noqa: F401
    kafka_options,
    kafka_stream_reader,
    read_stream_rate,
    read_stream_socket,
    read_stream_socket_events,
)
