"""cs_lstm baseline — mirrors ref scripts/baseline_cs_lstm.py (6->30)."""
from _common import baseline_main

if __name__ == "__main__":
    baseline_main("cs_lstm", __doc__)
