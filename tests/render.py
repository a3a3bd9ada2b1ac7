"""Shim: the synthetic renderer moved into the package (it is the
verification harness's SimCam analogue, used by apps/parity.py too)."""
from rebvo_tpu.io.render import (  # noqa: F401
    cartoon_texture, render_billboards_seq, render_plane_seq)
