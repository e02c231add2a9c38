from shineon_tpu.options import gan_options  # noqa: F401
from shineon_tpu.options.base_options import BaseOptions, namespace_from_defaults  # noqa: F401
from shineon_tpu.options.test_options import TestOptions  # noqa: F401
from shineon_tpu.options.train_options import TrainOptions  # noqa: F401
