"""Fixture tests for the power-benchmark telemetry parsers (VERDICT item 9:
the tpu-info/RAPL parsing had never run against real-shaped output).
Reference protocol analog: getWatt.hpp:94-121."""
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))

from power import parse_tpu_info_power, rapl_watts  # noqa: E402

RICH_TABLE = """\
TPU Power
┏━━━━━━━━━━━━┳━━━━━━━━━━━━━━━━━━━━━┓
┃ Chip       ┃ Power Draw          ┃
┡━━━━━━━━━━━━╇━━━━━━━━━━━━━━━━━━━━━┩
│ /dev/accel0 │ 45.25 W / 250.00 W │
│ /dev/accel1 │ 44.75 W / 250.00 W │
└────────────┴─────────────────────┘
"""

BARE_LISTING = """\
chip0 power: 51.5 W
chip1 power: 48.5 W
"""

METRICS_STYLE = """\
device_0 power_draw: 99.5
device_1 power_draw=100.5
"""


def test_rich_table_takes_current_not_limit():
    # the old token-sniffing parser summed the 250 W limits too
    assert abs(parse_tpu_info_power(RICH_TABLE) - 90.0) < 1e-9


def test_bare_watt_listing():
    assert abs(parse_tpu_info_power(BARE_LISTING) - 100.0) < 1e-9


def test_metrics_style():
    assert abs(parse_tpu_info_power(METRICS_STYLE) - 200.0) < 1e-9


def test_no_power_is_nan_not_zero():
    assert math.isnan(parse_tpu_info_power("TPU Chips\nno telemetry here"))
    assert math.isnan(parse_tpu_info_power(""))


def test_watt_suffix_without_space():
    assert abs(parse_tpu_info_power("draw 42.5W right now") - 42.5) < 1e-9


def test_rapl_watts_and_counter_wrap():
    assert abs(rapl_watts(1_000_000, 2_000_000, 0.1) - 10.0) < 1e-9
    # wrapped counter: must not report a huge negative wattage; NaN (not 0)
    # so the sample is DROPPED before the energy integral rather than
    # integrated as a bogus 0 W segment
    w = rapl_watts(10_000_000, 5_000, 0.1)
    assert w != w
