"""stgcnn baseline — mirrors ref scripts/baseline_stgcnn.py (6->30)."""
from _common import baseline_main

if __name__ == "__main__":
    baseline_main("stgcnn", __doc__)
