from . import optimizers
from .optimizers import Adam, SGD, RMSProp
from .largesteps import LargeSteps
