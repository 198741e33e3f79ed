
import time
t0 = time.time()
x = 0
while time.time() - t0 < 3:
    x += 1
print(x)
