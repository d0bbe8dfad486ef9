"""Independent NumPy oracle for the neuron dynamics equations.

Plain float64 Python/NumPy loops implementing the published dynamics
(Bittar & Garner 2022) directly from the equations — used to cross-check
the lax.scan / Pallas implementations step by step.
"""
import numpy as np

ALPHA_LIM = (np.exp(-1 / 5), np.exp(-1 / 25))
BETA_LIM = (np.exp(-1 / 30), np.exp(-1 / 120))
A_LIM = (-1.0, 1.0)
B_LIM = (0.0, 2.0)


def heaviside(x):
    return (x > 0).astype(np.float64)


def softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def lif(Wx, alpha, thr, u0, s0):
    alpha = np.clip(alpha, *ALPHA_LIM)
    u, s = u0.copy(), s0.copy()
    out = []
    for t in range(Wx.shape[1]):
        u = alpha * (u - s) + (1 - alpha) * Wx[:, t]
        s = heaviside(u - thr)
        out.append(s)
    return np.stack(out, axis=1)


def adlif(Wx, alpha, beta, a, b, thr, u0, w0, s0):
    alpha = np.clip(alpha, *ALPHA_LIM)
    beta = np.clip(beta, *BETA_LIM)
    a = np.clip(a, *A_LIM)
    b = np.clip(b, *B_LIM)
    u, w, s = u0.copy(), w0.copy(), s0.copy()
    out = []
    for t in range(Wx.shape[1]):
        w = beta * w + a * u + b * s
        u = alpha * (u - s) + (1 - alpha) * (Wx[:, t] - w)
        s = heaviside(u - thr)
        out.append(s)
    return np.stack(out, axis=1)


def rlif(Wx, alpha, V, thr, u0, s0):
    alpha = np.clip(alpha, *ALPHA_LIM)
    V = V.copy()
    np.fill_diagonal(V, 0.0)
    u, s = u0.copy(), s0.copy()
    out = []
    for t in range(Wx.shape[1]):
        u = alpha * (u - s) + (1 - alpha) * (Wx[:, t] + s @ V)
        s = heaviside(u - thr)
        out.append(s)
    return np.stack(out, axis=1)


def radlif(Wx, alpha, beta, a, b, V, thr, u0, w0, s0):
    alpha = np.clip(alpha, *ALPHA_LIM)
    beta = np.clip(beta, *BETA_LIM)
    a = np.clip(a, *A_LIM)
    b = np.clip(b, *B_LIM)
    V = V.copy()
    np.fill_diagonal(V, 0.0)
    u, w, s = u0.copy(), w0.copy(), s0.copy()
    out = []
    for t in range(Wx.shape[1]):
        w = beta * w + a * u + b * s
        u = alpha * (u - s) + (1 - alpha) * (Wx[:, t] + s @ V - w)
        s = heaviside(u - thr)
        out.append(s)
    return np.stack(out, axis=1)


def readout(Wx, alpha, u0):
    alpha = np.clip(alpha, *ALPHA_LIM)
    u = u0.copy()
    out = np.zeros_like(u0)
    for t in range(Wx.shape[1]):
        u = alpha * u + (1 - alpha) * Wx[:, t]
        out = out + softmax(u, axis=1)
    return out


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def rnn(Wx, V, y0):
    y = y0.copy()
    out = []
    for t in range(Wx.shape[1]):
        y = sigmoid(Wx[:, t] + y @ V)
        out.append(y)
    return np.stack(out, axis=1)


def ligru(Wx, Wzx, V, Vz, y0):
    y = y0.copy()
    out = []
    for t in range(Wx.shape[1]):
        z = sigmoid(Wzx[:, t] + y @ Vz)
        c = np.maximum(Wx[:, t] + y @ V, 0.0)
        y = z * y + (1 - z) * c
        out.append(y)
    return np.stack(out, axis=1)


def gru(Wx, Wzx, Wrx, V, Vz, Vr, y0):
    y = y0.copy()
    out = []
    for t in range(Wx.shape[1]):
        z = sigmoid(Wzx[:, t] + y @ Vz)
        r = sigmoid(Wrx[:, t] + y @ Vr)
        c = np.tanh(Wx[:, t] + (r * y) @ V)
        y = z * y + (1 - z) * c
        out.append(y)
    return np.stack(out, axis=1)


def cumulative_softmax(x):
    return softmax(x, axis=-1).sum(axis=1)
