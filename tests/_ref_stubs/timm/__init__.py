# timm stub for importing the reference models in tests (only the three
# symbols /root/reference/models/swin_transformer_v2.py:17 uses).
