"""Frozen, hashable config dataclasses.

The reference exposes per-component mutable ``Options`` structs
(reference: src/optical_flow_tracker/optical_flow.h:20-28). Here configs are
frozen dataclasses so they can be passed as static jit arguments; field names
and defaults keep the reference semantics.
"""

from __future__ import annotations

import dataclasses
import enum


class KltMethod(enum.Enum):
    """Solver mode for the sparse LK trackers.

    Mirrors OpticalFlowMethod (reference: optical_flow.h:11-18). The
    reference's kSse/kNeon are unimplemented placeholders; on TPU the
    equivalent "vectorized" path is FAST itself (it is fully batched), so
    they are intentionally absent.
    """

    INVERSE = "inverse"
    DIRECT = "direct"
    FAST = "fast"


@dataclasses.dataclass(frozen=True)
class KltOptions:
    """Options shared by all sparse LK trackers.

    Defaults mirror OpticalFlowOptions (reference: optical_flow.h:20-28).
    """

    max_track_points: int = 500
    max_iterations: int = 15
    max_tolerance_large_step: int = 3
    patch_row_half_size: int = 6
    patch_col_half_size: int = 6
    max_converge_step: float = 4e-2  # compared against SQUARED step norm
    method: KltMethod = KltMethod.FAST
    # Declares the tracked images integer-valued (uint8-derived, like the
    # reference's GrayImage buffers and build_pyramid's quantize=True
    # output). The compiled Pallas samplers then drop the lo-split pass on
    # image operands (exact in bf16). Set False when tracking on
    # non-integer imagery (e.g. quantize=False pyramids): the samplers
    # fall back to the full 3-pass split — without this, the dropped pass
    # silently raises sampling error from ~0.002 to ~0.47 gray levels,
    # above what the |v|^2 < 4e-2 convergence threshold tolerates.
    integer_pyramid: bool = True

    @property
    def patch_rows(self) -> int:
        return 2 * self.patch_row_half_size + 1

    @property
    def patch_cols(self) -> int:
        return 2 * self.patch_col_half_size + 1

    @property
    def ex_patch_rows(self) -> int:
        # Extended patch adds a 1-pixel border for central differences
        # (reference: optical_flow.cpp:104-124).
        return self.patch_rows + 2

    @property
    def ex_patch_cols(self) -> int:
        return self.patch_cols + 2


@dataclasses.dataclass(frozen=True)
class HarrisOptions:
    """Shi-Tomasi/Harris corner detection options.

    Mirrors the sibling-repo FeaturePointHarrisDetector options the demos
    configure (reference: test/test_optical_flow.cpp:34-39).
    """

    min_feature_distance: int = 25
    min_valid_response: float = 40.0
    # Number of local-max candidates considered before radius suppression.
    # Sized so large min-distance settings still reach the caller's
    # max_num after suppression (1024 capped the reference demo at ~146
    # of the expected ~250+ corners).
    max_candidates: int = 4096
    # Half window of the box filter over the structure tensor.
    window_half_size: int = 1


@dataclasses.dataclass(frozen=True)
class PyramidOptions:
    levels: int = 4
    # Match uint8 integer arithmetic of the reference pyramid (values are
    # truncated to integers after the 2x2 mean).
    quantize: bool = True
