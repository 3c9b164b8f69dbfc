from . import losses, trainer
