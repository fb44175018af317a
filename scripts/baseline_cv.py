"""cv baseline — mirrors ref scripts/baseline_cv.py (6->30)."""
from _common import baseline_main

if __name__ == "__main__":
    baseline_main("cv", __doc__)
