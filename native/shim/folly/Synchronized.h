// Minimal stand-in for folly::Synchronized, just enough for the
// reference dsdgen's dist.cpp (wlock()/rlock() over an unordered_map;
// see /root/reference/velox/tpcds/gen/dsdgen/include/dist.h:759).
// Single-threaded dump driver => a plain mutex suffices.
#pragma once

#include <mutex>

namespace folly {

template <typename T>
class Synchronized {
 public:
  class Locked {
   public:
    Locked(T* p, std::mutex& m) : p_(p), l_(m) {}
    T* operator->() { return p_; }
    T& operator*() { return *p_; }

   private:
    T* p_;
    std::unique_lock<std::mutex> l_;
  };

  Locked wlock() { return Locked(&v_, m_); }
  Locked rlock() { return Locked(&v_, m_); }

 private:
  T v_;
  std::mutex m_;
};

} // namespace folly
