from .envelope_json import parse_envelope_lines  # noqa: F401
from .fixtures import generate_event_log  # noqa: F401
