"""dash3d e2e: spin the server on synthetic Timelapse data, fetch over
HTTP + websocket (mirrors the reference integration test strategy,
tests/integration/experimental/dash3d).
"""
import json
import os
import threading

import numpy as np
import pytest

tornado = pytest.importorskip('tornado')


@pytest.fixture
def logdir(tmp_path):
    from kaolin_tpu.visualize import Timelapse
    tl = Timelapse(str(tmp_path))
    rng = np.random.default_rng(0)
    verts = rng.normal(size=(20, 3)).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    for it in (0, 5):
        tl.add_mesh_batch(iteration=it, category='output',
                          vertices_list=[verts * (it + 1)],
                          faces_list=[faces])
        tl.add_pointcloud_batch(iteration=it, category='input',
                                pointcloud_list=[verts])
    return str(tmp_path)


def test_binary_serialization_roundtrip():
    from kaolin_tpu.experimental.dash3d.util import (
        serialize_arrays, deserialize_arrays, MSG_MESH)
    verts = np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32)
    faces = np.arange(9, dtype=np.uint32).reshape(3, 3)
    payload = serialize_arrays(MSG_MESH, [verts, faces])
    msg_type, arrays = deserialize_arrays(payload)
    assert msg_type == MSG_MESH
    np.testing.assert_allclose(arrays[0], verts)
    np.testing.assert_array_equal(arrays[1], faces)


def test_streaming_helper(logdir):
    from kaolin_tpu.experimental.dash3d.util import (
        StreamingGeometryHelper, deserialize_arrays)
    helper = StreamingGeometryHelper(logdir)
    summary = helper.summary()
    assert len(summary['mesh']) == 1
    assert summary['mesh'][0]['timestamps'] == [0.0, 5.0]
    payload = helper.get_mesh_message('output', 0, time=5)
    msg_type, arrays = deserialize_arrays(payload)
    assert arrays[0].shape == (20, 3)
    assert arrays[1].shape == (2, 3)


def test_server_http_and_websocket(logdir):
    import asyncio
    import tornado.ioloop
    import tornado.httpclient
    import tornado.websocket
    from kaolin_tpu.experimental.dash3d.run import create_server
    from kaolin_tpu.experimental.dash3d.util import deserialize_arrays

    port = 8765
    results = {}

    async def run_test():
        create_server(logdir, port)
        client = tornado.httpclient.AsyncHTTPClient()
        resp = await client.fetch(f'http://localhost:{port}/summary')
        results['summary'] = json.loads(resp.body)
        resp = await client.fetch(f'http://localhost:{port}/')
        results['index'] = resp.body.decode()
        ws = await tornado.websocket.websocket_connect(
            f'ws://localhost:{port}/websocket')
        await ws.write_message(json.dumps(
            {'type': 'mesh', 'category': 'output', 'id': 0, 'time': 0}))
        msg = await ws.read_message()
        results['geometry'] = deserialize_arrays(msg)
        ws.close()

    asyncio.run(run_test())
    assert len(results['summary']['mesh']) == 1
    assert 'kaolin-dash3d' in results['index']
    msg_type, arrays = results['geometry']
    assert arrays[0].shape == (20, 3)
