from mccnn_tpu.io.pfm import read_pfm, write_pfm  # noqa: F401
from mccnn_tpu.io.calib import parse_calib  # noqa: F401
from mccnn_tpu.io.middlebury import (  # noqa: F401
    ensure_dir,
    ensure_dirs,
    save_disparity_pgm,
    save_time_file,
)
