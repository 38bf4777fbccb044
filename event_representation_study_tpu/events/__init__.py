from .core import (
    EventBlock,
    from_structured,
    normalize_polarity,
    pad_events,
    stack_blocks,
    to_structured,
)
from .fake import generate_fake_events
