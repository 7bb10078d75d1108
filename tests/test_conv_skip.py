"""M1 conversation-level existing-text skip."""

import pyarrow as pa
import ray.data as rd

from intelligent_ocr_ray.pipelines.conv_skip import (
    apply_conv_skip,
    conv_passthrough_flags,
)


def _fixture():
    # conv "big": plenty of existing plain text; conv "small": under the
    # 100-char doc threshold even though one turn is pdfish
    return rd.from_arrow(
        pa.table(
            {
                "conv_id": pa.array(["big", "big", "small", "small"], pa.string()),
                "turn_idx": pa.array([0, 1, 0, 1], pa.int32()),
                "role": pa.array(["user"] * 4, pa.string()),
                "text": pa.array(
                    [
                        "x" * 80,
                        "y" * 40,
                        "tiny",
                        "%LAYOUT\n10,10,50,20,0.9|hi",
                    ],
                    pa.string(),
                ),
            }
        )
    )


def test_flags():
    flags = conv_passthrough_flags(_fixture()).to_pandas().set_index("conv_id")
    assert bool(flags.loc["big", "passthrough"]) is True
    assert bool(flags.loc["small", "passthrough"]) is False
    assert int(flags.loc["big", "total_chars"]) == 120


def test_apply_marks_every_turn_of_flagged_conv():
    ds = _fixture()
    flags = conv_passthrough_flags(ds)
    out = apply_conv_skip(_fixture(), flags, num_partitions=2).to_pandas()
    out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert list(out.conv_route) == ["conv_passthrough", "conv_passthrough", None, None]
    assert len(out) == 4  # join never drops or duplicates turns
