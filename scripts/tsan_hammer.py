import ctypes, threading, numpy as np
lib = ctypes.CDLL("native/libpskq_tsan.so")
lib.pskq_create.restype = ctypes.c_void_p
lib.pskq_create.argtypes = [ctypes.c_uint64, ctypes.c_uint64]
lib.pskq_push.restype = ctypes.c_int
lib.pskq_push.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_uint64,
                          ctypes.c_double, ctypes.c_int32, ctypes.c_int32, ctypes.c_double,
                          ctypes.c_int32, ctypes.c_char_p]
lib.pskq_peek.restype = ctypes.c_int64
lib.pskq_peek.argtypes = [ctypes.c_void_p, ctypes.c_int64]
lib.pskq_pop_into.restype = ctypes.c_int
lib.pskq_pop_into.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_uint64] + [ctypes.c_void_p]*7 + [ctypes.c_uint64]
lib.pskq_stats.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64)]
h = lib.pskq_create(1<<20, 64)  # small: force overflow flushes under load
N, per = 6, 400
def producer(t):
    a = np.full(256, t, np.float32)
    for k in range(per):
        lib.pskq_push(h, a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), a.size,
                      0.0, 0, 0, 1.0, 1, b"s")
def consumer():
    buf = np.empty(4096, np.float32)
    t = ctypes.c_double(); xd = ctypes.c_double()
    a, b, c, d = (ctypes.c_int32(), ctypes.c_int32(), ctypes.c_int32(),
                  ctypes.c_int32())
    sid = ctypes.create_string_buffer(64)
    for _ in range(N*per):
        n = lib.pskq_peek(h, 20)
        if n < 0: break
        lib.pskq_pop_into(h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), buf.size,
                          ctypes.byref(t), ctypes.byref(a), ctypes.byref(b),
                          ctypes.byref(xd), ctypes.byref(c), ctypes.byref(d), sid, 64)
ths = [threading.Thread(target=producer, args=(t,)) for t in range(N)] + [threading.Thread(target=consumer) for _ in range(2)]
[t.start() for t in ths]; [t.join() for t in ths]
st = (ctypes.c_uint64*6)(); lib.pskq_stats(h, st)
print("stats:", list(st))
print("TSAN TEST DONE")

# --- channel-bank ring (native/pskbank.cpp): concurrent frame producers vs
# block consumers with overflow churn (small capacity forces flushes).
bl = ctypes.CDLL("native/libpskbank_tsan.so")
bl.pskbank_create.restype = ctypes.c_void_p
bl.pskbank_create.argtypes = [ctypes.c_int32, ctypes.c_int64]
bl.pskbank_push_interleaved.restype = ctypes.c_int
bl.pskbank_push_interleaved.argtypes = [ctypes.c_void_p,
                                        ctypes.POINTER(ctypes.c_float),
                                        ctypes.c_int64]
bl.pskbank_available.restype = ctypes.c_int64
bl.pskbank_available.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                 ctypes.c_int64]
bl.pskbank_pop_block.restype = ctypes.c_int64
bl.pskbank_pop_block.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_float),
                                 ctypes.c_int64, ctypes.c_void_p]
bl.pskbank_close.argtypes = [ctypes.c_void_p]
bl.pskbank_stats.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64)]
C = 8
bh = bl.pskbank_create(C, 512)     # small: overflow flushes under load
def bank_producer(t):
    a = np.full(97 * C * 2, float(t), np.float32)
    for _ in range(300):
        bl.pskbank_push_interleaved(
            bh, a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 97)
def bank_consumer():
    out = np.empty(C * 64 * 2, np.float32)
    fl = ctypes.c_int32()
    for _ in range(1200):
        if bl.pskbank_available(bh, 64, 10) < 64:
            continue
        bl.pskbank_pop_block(
            bh, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 64,
            ctypes.byref(fl))
ths = ([threading.Thread(target=bank_producer, args=(t,)) for t in range(4)]
       + [threading.Thread(target=bank_consumer) for _ in range(2)])
[t.start() for t in ths]; [t.join() for t in ths]
bl.pskbank_close(bh)
bst = (ctypes.c_uint64 * 4)(); bl.pskbank_stats(bh, bst)
print("bank stats:", list(bst))
print("TSAN BANK DONE")
