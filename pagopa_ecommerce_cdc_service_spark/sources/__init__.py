from .fixtures import generate_event_log  # noqa: F401
