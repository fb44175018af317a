"""K=5 candidate eval for trajectron — mirrors ref scripts/test_baseline_trajtron.py."""
from _common import baseline_main

if __name__ == "__main__":
    baseline_main("trajectron", __doc__, default_k=5)
