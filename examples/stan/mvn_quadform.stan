data { matrix[2,2] A; vector[2] b; real phi; }
parameters { vector[2] x; }
model { target += -0.5 * quad_form(inverse(A), x - b) - 0.5 * log_determinant(A); }
