"""FTP core engine (L2): frame pair -> unitless phase heightmap -> mm depth.

TPU-native re-design of the reference's shared signal-processing heart
(``shape_ftp.py``, SURVEY.md §3.2): every stage is a statically-shaped pure
function; the whole forward composes into one jitted graph.
"""

from vistaf_tpu.ftp.demod import ftp_complex_demod  # noqa: F401
from vistaf_tpu.ftp.pipeline import FTPPipeline, FTPGeometry  # noqa: F401
