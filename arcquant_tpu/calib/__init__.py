"""Calibration: activation stats, reorder indices, select proportions,
artifact persistence."""

from .calibrate import compute_calibration, site_activations, METRICS
from .artifacts import (save_calibration, load_calibration,
                        load_calibration_meta)
