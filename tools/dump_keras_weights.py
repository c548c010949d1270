#!/usr/bin/env python3
"""One-off DEV TOOL (not part of the engine): extract the reference's
trained LSTM weights from `lstm_model.keras` into the plain-text tensor
format that `graft.ops.Predict.LstmPredictor.fromFile` already reads.

The `.keras` file is a zip (public Keras 3 format); `model.weights.h5`
inside it is HDF5 — a fully public, documented format
(https://docs.hdfgroup.org/hdf5/develop/_f_m_t3.html). h5py is not
available offline, so this is a minimal stdlib-only reader of exactly
the subset the artifact uses: superblock v0, v1 B-tree groups
(TREE/SNOD + local HEAP), v1 object headers, contiguous/compact
float/int dataset layouts. ~150 lines; errors loudly on anything else.

Usage:
  python3 tools/dump_keras_weights.py /root/reference/lstm_model.keras \
      src/main/resources/graft/lstm_ref_weights.txt

Reference: lstm_model.keras config.json declares
InputLayer(batch_shape=[null,5,1]) -> LSTM(64, relu, return_sequences)
-> LSTM(32, relu) -> Dense(1); keras 3.9.2. Keras stores each LSTM
layer's weights as kernel (in, 4*units), recurrent_kernel (units,
4*units), bias (4*units), gate column-block order [i, f, g(cell), o].
"""
import io
import json
import struct
import sys
import zipfile


class H5(object):
    def __init__(self, buf):
        self.b = buf
        sig = buf[0:8]
        assert sig == b'\x89HDF\r\n\x1a\n', 'not HDF5'
        assert buf[8] == 0, 'only superblock v0 supported'
        assert buf[13] == 8 and buf[14] == 8, 'need 8-byte offsets/lengths'
        # v0 superblock: root symbol-table entry begins at offset 24+8*4=56? No:
        # sig(8) versions(4) sizes+reserved(4) group-k(4) flags(4) = 24, then
        # base(8) freespace(8) eof(8) driver(8) = 56, then root entry.
        self.root = self.symbol_entry(56)[1]

    def u(self, off, n):
        return int.from_bytes(self.b[off:off + n], 'little')

    def symbol_entry(self, off):
        """-> (link_name_heap_offset, object_header_addr, scratch_off)"""
        return self.u(off, 8), self.u(off + 8, 8), off + 24

    def heap_name(self, heap_addr, name_off):
        assert self.b[heap_addr:heap_addr + 4] == b'HEAP'
        data = self.u(heap_addr + 24, 8)
        end = self.b.index(b'\x00', data + name_off)
        return self.b[data + name_off:end].decode()

    def messages(self, oh_addr):
        """Yield (msg_type, data_offset, size) from a v1 object header,
        following continuation blocks."""
        assert self.b[oh_addr] == 1, 'only v1 object headers supported'
        nmsg = self.u(oh_addr + 2, 2)
        blocks = [(oh_addr + 16, self.u(oh_addr + 8, 4))]
        seen = 0
        while blocks and seen < nmsg:
            pos, remaining = blocks.pop(0)
            while remaining >= 8 and seen < nmsg:
                mtype = self.u(pos, 2)
                msize = self.u(pos + 2, 2)
                body = pos + 8
                if mtype == 0x0010:  # continuation
                    blocks.append((self.u(body, 8), self.u(body + 8, 8)))
                else:
                    yield mtype, body, msize
                seen += 1
                step = 8 + msize
                pos += step
                remaining -= step

    def group_entries(self, oh_addr):
        """If the object at oh_addr is a v1 group, -> [(name, child_oh)]."""
        btree = heap = None
        for mtype, body, _ in self.messages(oh_addr):
            if mtype == 0x0011:  # symbol table message
                btree, heap = self.u(body, 8), self.u(body + 8, 8)
        if btree is None:
            return None
        out = []

        def walk_btree(addr):
            assert self.b[addr:addr + 4] == b'TREE'
            level = self.b[addr + 5]
            n = self.u(addr + 6, 2)
            kids = addr + 24 + 8  # skip siblings + key0
            for i in range(n):
                child = self.u(kids + i * 16, 8)
                if level > 0:
                    walk_btree(child)
                else:
                    assert self.b[child:child + 4] == b'SNOD'
                    cnt = self.u(child + 6, 2)
                    for j in range(cnt):
                        noff, child_oh, _ = self.symbol_entry(child + 8 + 40 * j)
                        out.append((self.heap_name(heap, noff), child_oh))

        walk_btree(btree)
        return out

    def dataset(self, oh_addr):
        """-> (shape, floats) for a contiguous/compact numeric dataset."""
        shape, dt_class, dt_size, data = None, None, None, None
        for mtype, body, msize in self.messages(oh_addr):
            if mtype == 0x0001:  # dataspace
                ver, rank = self.b[body], self.b[body + 1]
                hdr = 8 if ver == 1 else 4  # v1: 8-byte hdr; v2: 4-byte
                shape = tuple(self.u(body + hdr + 8 * i, 8) for i in range(rank))
            elif mtype == 0x0003:  # datatype
                dt_class = self.b[body] & 0x0F
                dt_size = self.u(body + 4, 4)
            elif mtype == 0x0008:  # data layout
                ver = self.b[body]
                assert ver == 3, 'only layout message v3 supported'
                cls = self.b[body + 1]
                if cls == 1:  # contiguous
                    addr, sz = self.u(body + 2, 8), self.u(body + 10, 8)
                    data = self.b[addr:addr + sz]
                elif cls == 0:  # compact
                    sz = self.u(body + 2, 2)
                    data = self.b[body + 4:body + 4 + sz]
                else:
                    raise AssertionError('chunked layout unsupported')
        if shape is None or data is None:
            return None
        n = 1
        for d in shape:
            n *= d
        fmt = {(1, 4): 'f', (1, 8): 'd', (0, 4): 'i', (0, 8): 'q'}[(dt_class, dt_size)]
        vals = struct.unpack('<%d%s' % (n, fmt), data[:n * dt_size])
        return shape, list(vals)


def walk(h5, oh, path, out):
    entries = h5.group_entries(oh)
    if entries is None:
        out[path] = h5.dataset(oh)
        return
    for name, child in entries:
        walk(h5, child, path + '/' + name, out)


def main():
    keras_path, out_path = sys.argv[1], sys.argv[2]
    z = zipfile.ZipFile(keras_path)
    h5 = H5(z.read('model.weights.h5'))
    tensors = {}
    walk(h5, h5.root, '', tensors)
    for k, v in sorted(tensors.items()):
        print(k, v[0] if v else None)

    def t(path):
        shape, vals = tensors[path]
        return shape, vals

    def fmt(vals):
        return ','.join(repr(float(v)) for v in vals)

    lines = ['# Trained weights extracted from the reference artifact',
             '# lstm_model.keras (keras 3.9.2, saved 2025-04-20) by',
             '# tools/dump_keras_weights.py. Do not edit by hand.',
             'hidden:64,32', 'activation:relu']
    for idx, layer in enumerate(['lstm', 'lstm_1']):
        base = '/layers/%s/cell/vars' % layer
        (m, four_n), kernel = t(base + '/0')
        (n2, four_n2), recur = t(base + '/1')
        (four_n3,), bias = t(base + '/2')
        n = four_n // 4
        assert four_n == 4 * n and n2 == n and four_n2 == 4 * n and four_n3 == 4 * n
        # keras kernel is (in, 4*units) row-major, gate blocks [i,f,g,o];
        # the scala side wants per-gate (units, in) row-major: w[i*m+j]
        for gi, gate in enumerate(['i', 'f', 'g', 'o']):
            w = [kernel[j * four_n + gi * n + i] for i in range(n) for j in range(m)]
            u = [recur[j * four_n + gi * n + i] for i in range(n) for j in range(n)]
            b = [bias[gi * n + i] for i in range(n)]
            gl = 'g' if gate == 'g' else gate
            lines.append('l%d_w%s:%s' % (idx, gl, fmt(w)))
            lines.append('l%d_u%s:%s' % (idx, gl, fmt(u)))
            lines.append('l%d_b%s:%s' % (idx, gl, fmt(b)))
    (dn, done), dkern = t('/layers/dense/vars/0')
    (done2,), dbias = t('/layers/dense/vars/1')
    assert done == 1 and done2 == 1
    lines.append('wOut:%s' % fmt(dkern))
    lines.append('bOut:%s' % fmt(dbias))
    # frozen scaler constants from the sibling scaler.pkl (decoded f8 pair)
    lines.append('scaler_min:170.75782116164527')
    lines.append('scaler_max:189.0292566483142')
    with open(out_path, 'w') as f:
        f.write('\n'.join(lines) + '\n')
    print('wrote', out_path)


if __name__ == '__main__':
    main()
