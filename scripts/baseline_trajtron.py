"""trajectron baseline — mirrors ref scripts/baseline_trajtron.py (6->30)."""
from _common import baseline_main

if __name__ == "__main__":
    baseline_main("trajectron", __doc__)
