"""Physical-plan inspection utilities (SURVEY.md §4): the plan, not just
the answer, is part of this engine's contract — these helpers let tests and
operators assert pushdown, pruning, join strategy, and shuffle counts."""

from .inspect import (  # noqa: F401
    executed_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema,
    shuffle_count,
)
