"""K=5 candidate eval for stgcnn — mirrors ref scripts/test_baseline_stgcnn.py."""
from _common import baseline_main

if __name__ == "__main__":
    baseline_main("stgcnn", __doc__, default_k=5)
