"""mmcv stub: just enough surface for the reference's models/checkpoint.py
and models/decoder_*.py to import in tests (the real dependency is the pure-
python mmcv-lite 1.4.3, reference requirements.txt:5)."""
import os

__version__ = "1.4.3-stub"


def mkdir_or_exist(d):
    os.makedirs(d, exist_ok=True)
