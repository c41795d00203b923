"""Generation pipelines (jit-scanned denoise loops) for all six families.

Submodules are imported directly (e.g. ``from vap_tpu.pipelines.
cogvideox_i2v_mot import CogVideoXI2VMOTPipeline``) — no eager re-exports
here, so importing one family does not pull in the others' encoders. This
file exists so setuptools packages the directory (packages.find only
discovers regular packages; as an implicit namespace package, pipelines was
silently dropped from wheels).
"""
