from .params import Params, Obstacles
from . import io, state
