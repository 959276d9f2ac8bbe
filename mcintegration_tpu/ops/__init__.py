from . import grid, ksum
