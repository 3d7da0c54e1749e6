from .inference import inference_detector, init_detector
from .train import (build_lr_schedule, build_optimizer, make_train_step)

__all__ = ['build_lr_schedule', 'build_optimizer', 'inference_detector',
           'init_detector', 'make_train_step']
