"""social_lstm baseline — mirrors ref scripts/baseline_sociallstm.py (6->30)."""
from _common import baseline_main

if __name__ == "__main__":
    baseline_main("social_lstm", __doc__)
