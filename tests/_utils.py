"""Test-suite alias for the synthetic scene fixtures.

The real implementations live in atvsnet_tpu/data/synthetic.py (they are a
production capability: bench, the driver dry run, synthetic training —
VERDICT r3 item 6); this module re-exports them for the test suite's imports.
"""

from atvsnet_tpu.data.synthetic import (  # noqa: F401
    make_cam,
    render_multiplane_scene,
    render_multiplane_views,
    rotation,
    synthetic_batch,
    synthetic_scene,
)
