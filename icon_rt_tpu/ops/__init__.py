from . import camera, woodcock, render
