"""Config hygiene: every CannyConfig field must have a reader.

The reference scatters dead/compile-time knobs (NUM_BLOCKS/BLOCK_SIZE,
src/cuda.cu:9-10, unused once tiling hard-codes 32); this framework's rule
is the opposite — a config field nobody reads is deleted (hysteresis_steps
in round 4, tile in round 5).  This test makes the invariant mechanical:
each dataclass field must be accessed as an attribute somewhere in the
package outside config.py itself.
"""

import dataclasses
import pathlib
import re

from canny_edge_tpu.config import CannyConfig

PKG = pathlib.Path(__file__).resolve().parents[1] / "canny_edge_tpu"


def test_every_config_field_has_a_reader():
    # the reader must be an attribute access on a config-typed receiver
    # (every production reader binds the instance as `cfg`/`config`) —
    # a bare `.field` match would also count argparse-namespace accesses
    # and docstring mentions, letting a genuinely dead field pass
    source = "\n".join(
        p.read_text()
        for p in PKG.rglob("*.py")
        if p.name != "config.py"
    )
    missing = [
        f.name
        for f in dataclasses.fields(CannyConfig)
        if not re.search(rf"\b(?:cfg|config)\.{re.escape(f.name)}\b",
                         source)
    ]
    assert not missing, (
        f"CannyConfig fields with no reader in the package: {missing} — "
        "wire them or delete them (see round-4 hysteresis_steps removal)."
    )


def test_tile_knob_stays_deleted():
    names = {f.name for f in dataclasses.fields(CannyConfig)}
    assert "tile" not in names and "hysteresis_steps" not in names
