"""Model registry: string name -> model class (reference: models/__init__.py:4-32).

``find_model_using_name("warp")`` imports ``shineon_tpu.models.warp_model`` and
returns the class whose lowercase name equals ``warpmodel`` and subclasses
``BaseModel``.
"""

from __future__ import annotations

import importlib


def find_model_using_name(model_name: str):
    model_filename = "shineon_tpu.models." + model_name + "_model"
    modellib = importlib.import_module(model_filename)

    from shineon_tpu.models.base_model import BaseModel

    target_model_name = model_name.replace("_", "") + "model"
    for name, cls in modellib.__dict__.items():
        if name.lower() == target_model_name.lower() and issubclass(cls, BaseModel):
            return cls

    raise NotImplementedError(
        f"module {model_filename} does not define a BaseModel subclass whose "
        f"lowercased name equals {target_model_name!r}"
    )


def get_option_setter(model_name: str):
    model_class = find_model_using_name(model_name)
    return model_class.modify_commandline_options
