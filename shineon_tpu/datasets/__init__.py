"""Dataset registry (reference: datasets/__init__.py:9-36)."""

from __future__ import annotations

import importlib

from shineon_tpu.datasets.base_dataset import BaseDataset  # noqa: F401


def find_dataset_using_name(dataset_name: str):
    dataset_filename = "shineon_tpu.datasets." + dataset_name + "_dataset"
    datasetlib = importlib.import_module(dataset_filename)

    target_dataset_name = dataset_name.replace("_", "") + "dataset"
    for name, cls in datasetlib.__dict__.items():
        if name.lower() == target_dataset_name.lower() and issubclass(cls, BaseDataset):
            return cls

    raise NotImplementedError(
        f"module {dataset_filename} does not define a BaseDataset subclass "
        f"whose lowercased name equals {target_dataset_name!r}"
    )


def get_option_setter(dataset_name: str):
    dataset_class = find_dataset_using_name(dataset_name)
    return dataset_class.modify_commandline_options
