"""mmtrans baseline — mirrors ref scripts/baseline_mmtrans.py (6->30)."""
from _common import baseline_main

if __name__ == "__main__":
    baseline_main("mmtrans", __doc__)
