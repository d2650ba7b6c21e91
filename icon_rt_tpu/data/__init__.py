from . import icfile, synthetic
