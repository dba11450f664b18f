"""Session runner + artifact/file contract (L5 I/O side)."""

from vistaf_tpu.runner import io  # noqa: F401
from vistaf_tpu.runner import session  # noqa: F401
