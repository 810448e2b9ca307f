"""Minimal mmcv.runner stand-in: just enough for the reference's
models/optimizer.py (SwinLayerDecayOptimizerConstructor) to build a real
torch optimizer, so the training-dynamics oracle can run the reference's OWN
param-grouping code instead of a reimplementation."""
import torch


def get_dist_info():
    return 0, 1


class _Registry:
    def __init__(self):
        self._modules = {}

    def register_module(self):
        def deco(cls):
            self._modules[cls.__name__] = cls
            return cls
        return deco

    def get(self, name):
        return self._modules[name]


OPTIMIZER_BUILDERS = _Registry()


class DefaultOptimizerConstructor:
    """mmcv's constructor protocol: __init__(optimizer_cfg, paramwise_cfg),
    __call__(model) -> torch optimizer built over self.add_params groups."""

    def __init__(self, optimizer_cfg, paramwise_cfg=None):
        self.optimizer_cfg = dict(optimizer_cfg)
        self.paramwise_cfg = {} if paramwise_cfg is None else paramwise_cfg
        self.base_lr = self.optimizer_cfg.get("lr")
        self.base_wd = self.optimizer_cfg.get("weight_decay")

    def add_params(self, params, module, prefix="", is_dcn_module=None):
        params.extend(p for p in module.parameters() if p.requires_grad)

    def __call__(self, model):
        if hasattr(model, "module"):
            model = model.module
        cfg = dict(self.optimizer_cfg)
        params = []
        self.add_params(params, model)
        cfg["params"] = params
        opt_type = cfg.pop("type")
        return getattr(torch.optim, opt_type)(**cfg)


def build_optimizer(model, cfg):
    cfg = dict(cfg)
    constructor_name = cfg.pop("constructor", "DefaultOptimizerConstructor")
    paramwise_cfg = cfg.pop("paramwise_cfg", None)
    cls = (DefaultOptimizerConstructor
           if constructor_name == "DefaultOptimizerConstructor"
           else OPTIMIZER_BUILDERS.get(constructor_name))
    return cls(optimizer_cfg=cfg, paramwise_cfg=paramwise_cfg)(model)
