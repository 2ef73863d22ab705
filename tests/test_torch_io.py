import numpy as np
import pytest
import torch

from tpuseg.weights.torch_io import load_torch_file, flatten_state_dict


def _sample_state():
    g = torch.Generator().manual_seed(0)
    return {
        "conv.weight": torch.randn(8, 3, 3, 3, generator=g),
        "bn.running_mean": torch.randn(8, generator=g),
        "fc.weight": torch.randn(10, 8, generator=g, dtype=torch.float64),
        "step": torch.tensor(42, dtype=torch.int64),
        "half": torch.randn(4, 4, generator=g).to(torch.float16),
        "flag": torch.tensor([True, False]),
        "nested": {"a": torch.arange(6, dtype=torch.int32).reshape(2, 3)},
    }


@pytest.mark.parametrize("zipfmt", [True, False], ids=["zip", "legacy"])
def test_roundtrip_torch_save(tmp_path, zipfmt):
    state = _sample_state()
    path = str(tmp_path / "ckpt.pth")
    torch.save(state, path, _use_new_zipfile_serialization=zipfmt)
    loaded = load_torch_file(path)
    flat = flatten_state_dict(loaded)
    want = flatten_state_dict(
        {k: (v.numpy() if isinstance(v, torch.Tensor) else v)
         for k, v in _flatten_torch(state).items()}
    )
    assert set(flat) == set(want)
    for k in want:
        np.testing.assert_array_equal(flat[k], want[k], err_msg=k)
        assert flat[k].dtype == want[k].dtype, k


def _flatten_torch(d, pre=""):
    out = {}
    for k, v in d.items():
        if isinstance(v, dict):
            out.update(_flatten_torch(v, f"{pre}{k}."))
        else:
            out[f"{pre}{k}"] = v
    return out


def test_noncontiguous_and_sliced_tensors(tmp_path):
    base = torch.randn(10, 10)
    state = {"t": base.t(), "s": base[2:7, 1:4]}  # transposed + strided views
    path = str(tmp_path / "v.pth")
    torch.save(state, path)
    loaded = load_torch_file(path)
    np.testing.assert_array_equal(loaded["t"], base.t().numpy())
    np.testing.assert_array_equal(loaded["s"], base[2:7, 1:4].numpy())


def test_bfloat16(tmp_path):
    state = {"w": torch.randn(4, 4).to(torch.bfloat16)}
    path = str(tmp_path / "bf16.pth")
    torch.save(state, path)
    loaded = load_torch_file(path)
    got = np.asarray(loaded["w"], dtype=np.float32)
    np.testing.assert_array_equal(got, state["w"].float().numpy())


def test_wrapped_state_dict(tmp_path):
    state = {"state_dict": {"layer.weight": torch.ones(2, 2)},
             "epoch": 7, "optimizer": None}
    path = str(tmp_path / "wrapped.pth")
    torch.save(state, path)
    flat = flatten_state_dict(load_torch_file(path))
    assert list(flat) == ["layer.weight"]


def test_plain_pickle_pkl(tmp_path):
    import pickle
    state = {"a": np.arange(5, dtype=np.float32), "b": {"c": np.ones((2, 2))}}
    path = str(tmp_path / "plain.pkl")
    with open(path, "wb") as f:
        pickle.dump(state, f)
    flat = flatten_state_dict(load_torch_file(path))
    np.testing.assert_array_equal(flat["a"], state["a"])
    np.testing.assert_array_equal(flat["b.c"], state["b"]["c"])


def test_save_torch_file_loads_in_torch(tmp_path, rng):
    """Our writer's output must load with real torch.load."""
    from tpuseg.weights.torch_io import save_torch_file

    state = {
        "a.weight": rng.standard_normal((4, 3, 2, 2)).astype(np.float32),
        "b.bias": rng.standard_normal(7).astype(np.float64),
        "c.step": np.asarray([3], np.int64),
        "nested": {"d": rng.integers(0, 255, (5,)).astype(np.uint8)},
    }
    path = str(tmp_path / "ours.pth")
    save_torch_file(path, state)
    loaded = torch.load(path, weights_only=False)
    np.testing.assert_array_equal(loaded["a.weight"].numpy(), state["a.weight"])
    np.testing.assert_array_equal(loaded["b.bias"].numpy(), state["b.bias"])
    np.testing.assert_array_equal(loaded["c.step"].numpy(), state["c.step"])
    np.testing.assert_array_equal(
        loaded["nested"]["d"].numpy(), state["nested"]["d"])
    # and with our own reader too
    ours = load_torch_file(path)
    np.testing.assert_array_equal(ours["a.weight"], state["a.weight"])


def test_malicious_pickle_is_inert(tmp_path):
    import pickle
    """A crafted checkpoint must not reach builtins.eval/exec or os.system.

    torch_io treats zoo checkpoints as untrusted; find_class must resolve
    only an allowlist of globals and stub everything else (ADVICE r1 high).
    """
    import pickletools

    class Evil:
        def __reduce__(self):
            return (eval, ("__import__('os').system('echo pwned')",))

    path = str(tmp_path / "evil.pkl")
    with open(path, "wb") as f:
        pickle.dump({"payload": Evil(), "w": np.ones(3, np.float32)}, f)
    # sanity: the stream really does reference builtins.eval
    ops = [(op.name, arg) for op, arg, _ in pickletools.genops(open(path, "rb").read())]
    assert any("eval" in str(a) for _, a in ops)

    loaded = load_torch_file(path)
    # the evil global resolved to an inert stub instance, not an executed call
    assert type(loaded["payload"]).__name__ == "eval"
    np.testing.assert_array_equal(loaded["w"], np.ones(3, np.float32))


def test_os_system_pickle_is_inert(tmp_path):
    import os
    import pickle

    class Evil:
        def __reduce__(self):
            return (os.system, ("echo pwned",))

    path = str(tmp_path / "evil2.pkl")
    with open(path, "wb") as f:
        pickle.dump(Evil(), f)
    loaded = load_torch_file(path)
    assert type(loaded).__name__ == "system"
