"""Run fast-vs-exact gates with a patched _GL_EXPO_MAX (env GLMAX)."""
import os
import triceratops_tpu.ops.lightcurve as lcmod
lcmod._GL_EXPO_MAX = int(os.environ["GLMAX"])
from test_fastcore import TestFastVsExactCores, TestEndToEndConsistency

class TestGLPlanet(TestFastVsExactCores):
    pass

class TestGLE2E(TestEndToEndConsistency):
    pass
