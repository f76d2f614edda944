from .observers import (  # noqa: F401
    OBSERVER_KINDS,
    ObserverSpec,
    ObserverStats,
    finalize,
    init_stats,
    update,
)
