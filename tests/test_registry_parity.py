"""Every registry name the reference ever registers must resolve here.

The registry is the reference's central extension mechanism
(funasr/register.py:8): YAML configs bind components by
``tables.<kind>.get(name)``.  This test greps the reference tree for every
``@tables.register("<kind>", "<name>")`` and asserts our registry (plus
registry_compat aliases) resolves each one — the line-by-line guarantee
that any reference config.yaml's component names bind.
"""

import os
import re
import subprocess

import pytest

REF = "/root/reference/funasr"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_every_reference_registry_name_resolves():
    import funasr_tpu  # noqa: F401
    import funasr_tpu.datasets  # noqa: F401
    import funasr_tpu.frontends  # noqa: F401
    import funasr_tpu.models  # noqa: F401
    import funasr_tpu.registry_compat as RC
    import funasr_tpu.tokenizer  # noqa: F401
    from funasr_tpu.registry import tables

    RC.install()
    out = subprocess.run(
        ["grep", "-rhoP", r'register\("(\w+)", "[^"]+"\)', REF],
        capture_output=True, text=True).stdout
    pairs = sorted(set(re.findall(r'register\("(\w+)", "([^"]+)"\)', out)))
    assert len(pairs) > 140, f"grep found only {len(pairs)} registrations"
    missing = []
    for kind, name in pairs:
        try:
            cls = tables.get(kind, name)
            assert cls is not None
        except Exception:
            missing.append(f"{kind}/{name}")
    assert not missing, f"unresolvable reference names: {missing}"
