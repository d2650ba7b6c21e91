from . import xf, pipeline
