import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ccdb_data_pipeline_spark.session import build_session  # noqa: E402

# Deep-search knob: ENGINE_HYPOTHESIS_SCALE=N multiplies every inline
# @settings(max_examples=...) in the suite — the long-background bug-hunt
# mode (the default counts are sized for the CI wall clock, not for search
# depth). conftest imports before any test module, so wrapping the public
# alias here covers every decorator; the suites set deadline=None and use
# fresh random seeds per run, so a scaled run is a genuinely deeper search,
# not a longer replay.
_scale = int(os.environ.get("ENGINE_HYPOTHESIS_SCALE", "1") or "1")
if _scale > 1:
    import hypothesis as _hyp

    _real_settings = _hyp.settings

    def _scaled_settings(*args, **kw):
        if "max_examples" in kw:
            kw["max_examples"] = int(kw["max_examples"]) * _scale
        return _real_settings(*args, **kw)

    for _attr in ("register_profile", "load_profile", "get_profile", "default"):
        if hasattr(_real_settings, _attr):
            setattr(_scaled_settings, _attr, getattr(_real_settings, _attr))
    _hyp.settings = _scaled_settings


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="cdc-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.streaming.schemaInference": "false"},
    )
    yield s
    s.stop()
