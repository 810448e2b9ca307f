class FileClient:
    """Unused at test time; present so `from mmcv.fileio import FileClient`
    (reference models/checkpoint.py:28) resolves."""

    def __init__(self, *a, **k):
        raise NotImplementedError("mmcv stub")


def load(*a, **k):
    raise NotImplementedError("mmcv stub")
