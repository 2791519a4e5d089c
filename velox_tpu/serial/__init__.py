"""Wire-format serializers (velox/serializers analog)."""

from velox_tpu.serial.page import (
    deserialize_compact_rows, deserialize_page, serialize_compact_rows,
    serialize_page,
)

__all__ = [
    "serialize_page", "deserialize_page",
    "serialize_compact_rows", "deserialize_compact_rows",
]
