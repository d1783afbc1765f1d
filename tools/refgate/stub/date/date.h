// Minimal stand-in for HowardHinnant/date (a conan dependency of the
// reference that is not vendored): Progressifier.cpp only streams a
// system_clock::time_point via date's operator<<. The timestamp text is
// irrelevant for the estimator gate, so print epoch seconds.
#pragma once

#include <chrono>
#include <ostream>

namespace date {

inline std::ostream &operator<<(std::ostream &os,
                                const std::chrono::system_clock::time_point &tp) {
  return os << std::chrono::duration_cast<std::chrono::seconds>(
                   tp.time_since_epoch())
                   .count();
}

} // namespace date
