"""TPU image primitives (L1 of the layer map).

The reference duplicated these helpers across scripts with no shared module
(SURVEY.md §1, L1).  Here they are deduplicated into one statically-shaped,
jit-compatible op library.
"""

from vistaf_tpu.ops import geometry  # noqa: F401
from vistaf_tpu.ops import color  # noqa: F401
from vistaf_tpu.ops import filters  # noqa: F401
from vistaf_tpu.ops import percentile  # noqa: F401
from vistaf_tpu.ops import morphology  # noqa: F401
from vistaf_tpu.ops import distance  # noqa: F401
from vistaf_tpu.ops import components  # noqa: F401
from vistaf_tpu.ops import inpaint  # noqa: F401
from vistaf_tpu.ops import fftops  # noqa: F401
from vistaf_tpu.ops import warp  # noqa: F401
from vistaf_tpu.ops import registration  # noqa: F401
from vistaf_tpu.ops import polyfit  # noqa: F401
from vistaf_tpu.ops import unwrap  # noqa: F401
