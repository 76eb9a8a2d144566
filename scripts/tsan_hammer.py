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
