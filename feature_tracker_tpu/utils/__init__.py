"""Host-side utilities: timers, logging, visualization.

TPU-native equivalents of the reference's Slam_Utility / Visualizor2D
sibling-repo pieces (SURVEY.md E8/E9): TickTock wall-clock timing
(reference: test_optical_flow.cpp:69-73), ReportInfo/ReportError colored
logging, and PNG rendering of detected / tracked / matched features
(reference: Visualizor2D usage at test_optical_flow.cpp:78,
test_descriptor_matcher_brief.cpp:97) — writing files instead of GUI
windows.
"""

from feature_tracker_tpu.utils.log import (  # noqa: F401
    report_debug,
    report_error,
    report_info,
    report_warn,
)
from feature_tracker_tpu.utils.timer import TickTock, time_jitted  # noqa: F401
