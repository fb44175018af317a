"""gail baseline — mirrors ref scripts/baseline_GAIL.py (6->30)."""
from _common import baseline_main

if __name__ == "__main__":
    baseline_main("gail", __doc__)
