"""pull_checkpoint local-source installs (air-gapped path, PARITY_RUNBOOK.md
§1). Network mode is untestable offline; the cache layout contract is what
the loaders depend on."""
import os
import tarfile

from viewformer_tpu.utils import pull_checkpoint


def _make_checkpoint_tar(tmp_path):
    src = tmp_path / 'content'
    src.mkdir()
    (src / 'config.json').write_text('{"model": "migt"}')
    (src / 'weights.index').write_bytes(b'\x00fake')
    tar_path = tmp_path / 'sm7-transformer-tf.tar.gz'
    with tarfile.open(tar_path, 'w:gz') as tf:
        for name in ('config.json', 'weights.index'):
            tf.add(src / name, arcname=name)
    return tar_path, src


def test_install_from_tarball(tmp_path, monkeypatch):
    monkeypatch.setenv('HOME', str(tmp_path / 'home'))
    tar_path, _ = _make_checkpoint_tar(tmp_path)
    path = pull_checkpoint('sm7-transformer-tf', local_source=str(tar_path))
    assert path == str(tmp_path / 'home' / '.cache' / 'viewformer'
                       / 'sm7-transformer-tf')
    assert os.path.exists(os.path.join(path, 'config.json'))
    assert os.path.exists(os.path.join(path, 'weights.index'))
    # cached: second call returns without touching the source
    assert pull_checkpoint('sm7-transformer-tf') == path


def test_install_from_directory_and_override(tmp_path, monkeypatch):
    monkeypatch.setenv('HOME', str(tmp_path / 'home'))
    _, src = _make_checkpoint_tar(tmp_path)
    path = pull_checkpoint('sm7-codebook-th', local_source=str(src))
    assert open(os.path.join(path, 'config.json')).read() == '{"model": "migt"}'
    (src / 'config.json').write_text('{"model": "vqgan"}')
    # without override the cached copy wins
    pull_checkpoint('sm7-codebook-th', local_source=str(src))
    assert open(os.path.join(path, 'config.json')).read() == '{"model": "migt"}'
    pull_checkpoint('sm7-codebook-th', local_source=str(src), override=True)
    assert open(os.path.join(path, 'config.json')).read() == '{"model": "vqgan"}'
