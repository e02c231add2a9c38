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
        "In %s.py, there should be a subclass of BaseModel with class name that "
        "matches %s in lowercase." % (model_filename, target_model_name)
    )


def get_option_setter(model_name: str):
    model_class = find_model_using_name(model_name)
    return model_class.modify_commandline_options
